"""Package tera_spark for cluster submission:

    python tools/make_pyfiles.py            # writes dist/tera_spark.zip
    spark-submit --py-files dist/tera_spark.zip \
        -m tera_spark.pipeline.driver --transcripts <path> --out <dir>

Plain zip of the package sources — no build system needed (pure Python).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "tera_spark.zip")
    pkg = os.path.join(REPO, "tera_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
