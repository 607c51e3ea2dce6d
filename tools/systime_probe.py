"""Attribute kernel (system) CPU time during a run: sample /proc/<pid>/stat
utime/stime for every java/python process plus box-wide /proc/stat and the
context-switch counter, twice, N seconds apart. Prints per-process user/sys
core-seconds and box totals — cheap enough to run alongside a measurement
(reads /proc only).

Usage: python tools/systime_probe.py [interval_sec]
"""

from __future__ import annotations

import os
import sys
import time

HZ = os.sysconf("SC_CLK_TCK")


def _procs() -> dict[int, tuple[str, int, int, int]]:
    out = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(")", 1)
                comm = parts[0].split("(", 1)[1]
                rest = parts[1].split()
            if comm not in ("java", "python", "python3", "python3.11"):
                continue
            utime, stime = int(rest[11]), int(rest[12])
            threads = int(rest[17])
            out[int(pid)] = (comm, utime, stime, threads)
        except (OSError, IndexError, ValueError):
            continue
    return out


def _box() -> tuple[list[int], int]:
    cpu = ctxt = None
    with open("/proc/stat") as fh:
        for line in fh:
            if line.startswith("cpu "):
                cpu = [int(x) for x in line.split()[1:9]]
            elif line.startswith("ctxt"):
                ctxt = int(line.split()[1])
    return cpu, ctxt


def main() -> None:
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    p0, (c0, x0) = _procs(), _box()
    time.sleep(interval)
    p1, (c1, x1) = _procs(), _box()

    rows = []
    for pid, (comm, u1, s1, th) in p1.items():
        if pid in p0:
            _, u0, s0, _ = p0[pid]
            du, ds = (u1 - u0) / HZ, (s1 - s0) / HZ
            if du + ds > 0.5:
                rows.append((ds, du, pid, comm, th))
    rows.sort(reverse=True)
    print(f"{'pid':>7} {'comm':<8} {'thr':>5} {'user_cores':>10} {'sys_cores':>10}")
    tot_u = tot_s = 0.0
    for ds, du, pid, comm, th in rows:
        print(f"{pid:>7} {comm:<8} {th:>5} {du / interval:>10.2f} {ds / interval:>10.2f}")
        tot_u += du
        tot_s += ds
    d = [b - a for a, b in zip(c0, c1)]
    tot = sum(d) or 1
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    box = {n: round(100 * v / tot, 1) for n, v in zip(names, d)}
    ncpu = os.cpu_count() or 1
    print(
        f"\nprocess totals: user {tot_u / interval:.2f} cores, "
        f"sys {tot_s / interval:.2f} cores over {interval:.0f}s"
    )
    print(f"box window: {box}  (x{ncpu} cpus)")
    print(f"context switches/sec: {(x1 - x0) / interval:,.0f}")


if __name__ == "__main__":
    main()
