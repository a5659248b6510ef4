"""Build the spark-submit --py-files artifact (north rule packaging).

Usage:  python tools/package.py [out.zip]   (default /tmp/sonic_etl_spark.zip)

Zips the ``sonic_etl_spark`` package (sources only) so a cluster run is:

    spark-submit --py-files <out.zip> jobs/replay_job.py \
        --log <change_log_parquet> --table <table_dir>

The zip is import-validated before the path is printed: a child interpreter
with ONLY the zip on sys.path must import every module — catching missing
files or stray absolute imports at package time, not on the cluster.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "sonic_etl_spark"


def build(out: str) -> str:
    src = os.path.join(ROOT, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(src):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return out


def validate(out: str) -> None:
    mods = []
    for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), ROOT)
            dotted = rel[: -len(".py")].replace(os.sep, ".")
            if dotted.endswith(".__init__"):
                dotted = dotted[: -len(".__init__")]
            mods.append(dotted)
    code = (
        "import sys, importlib; sys.path.insert(0, sys.argv[1]);\n"
        "names = sys.argv[2].split(',')\n"
        "[importlib.import_module(n) for n in names]\n"
        "print('imported', len(names), 'modules from zip')"
    )
    subprocess.run(
        [sys.executable, "-c", code, out, ",".join(mods)],
        check=True, cwd="/",
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sonic_etl_spark.zip"
    build(out)
    validate(out)
    print(out)
    print(
        f"spark-submit --py-files {out} jobs/replay_job.py "
        "--log <change_log> --table <table_dir>"
    )


if __name__ == "__main__":
    main()
