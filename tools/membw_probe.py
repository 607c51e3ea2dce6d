"""Raw memory-bandwidth ceiling probe — ZERO Spark, zero JVM, zero engine.

Closes the attribution chain for the multi-JVM scaling pair with a
measurement that cannot implicate the engine: if K independent
single-threaded numpy STREAM-copy processes stop gaining aggregate
bandwidth as K grows, the guest's memory bus saturates at that point and
ANY memory-heavy 4N-core layout on this box (Spark or not, one JVM or
four) shares that ceiling. A real cluster with one executor per node has
one bus PER executor, so the ceiling does not transfer.

Method: each child allocates two ~256 MiB float64 arrays (far beyond
LLC), warms them, sleeps until a shared start timestamp, then runs
`np.copyto(dst, src)` for a fixed rep count and reports copied-GiB/s
(bytes-copied convention: N*reps/t; actual bus traffic is ~2x that,
read + write, constant across K so ratios are unaffected). The parent
launches K children simultaneously for K in a sweep, records per-child
and aggregate bandwidth plus the /proc/stat host window, and appends one
record per K to BENCH/scaling_runs.jsonl with mode="membw" for the
report generator.

Usage: python tools/membw_probe.py [k1,k2,...]   (default 1,2,4,8,16,32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")

MIB = 256          # per-array size (two arrays/child)
REPS = 24          # ~2-6 s per child at typical sandbox bandwidths

_CHILD = r"""
import json, time
import numpy as np

n = {mib} * 1024 * 1024 // 8
src = np.arange(n, dtype=np.float64)          # touch = commit pages
dst = np.empty_like(src)
np.copyto(dst, src)                            # warm both + page in
# synchronized start so all K children contend simultaneously
while time.time() < {start_at}:
    time.sleep(0.005)
t0 = time.perf_counter()
for _ in range({reps}):
    np.copyto(dst, src)
secs = time.perf_counter() - t0
gib = {mib} / 1024 * {reps}
print(json.dumps({{"gibps": round(gib / secs, 2), "seconds": round(secs, 3)}}))
"""

_CPU_FIELDS = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]


def _cpu_stat() -> list[int]:
    with open("/proc/stat") as fh:
        return [int(x) for x in fh.readline().split()[1:9]]


def _cpu_window(before: list[int], after: list[int]) -> dict:
    d = [b - a for a, b in zip(before, after)]
    tot = sum(d) or 1
    return {nm: round(100 * v / tot, 1) for nm, v in zip(_CPU_FIELDS, d)}


def measure(k: int, source: str) -> dict:
    start_at = time.time() + 8 + k * 0.25      # alloc+warm headroom
    code = _CHILD.format(mib=MIB, reps=REPS, start_at=start_at)
    s0 = _cpu_stat()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for _ in range(k)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    win = _cpu_window(s0, _cpu_stat())
    per = []
    for (out, err), p in zip(outs, procs):
        if p.returncode != 0:
            raise SystemExit(f"child failed: {err[-1000:]}")
        per.append(json.loads(out.strip().splitlines()[-1])["gibps"])
    rec = {
        "mode": "membw",
        "k": k,
        "array_mib": MIB,
        "per_child_gibps": per,
        "aggregate_gibps": round(sum(per), 2),
        "hostcpu": win,
        "ts": int(time.time()),
        "source": source,
    }
    return rec


def main() -> None:
    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1, 2, 4, 8, 16, 32]
    )
    source = f"membw-{int(time.time())}-{os.getpid()}"
    os.makedirs(os.path.dirname(HISTORY), exist_ok=True)
    for k in ks:
        rec = measure(k, source)
        print(json.dumps(rec))
        with open(HISTORY, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
