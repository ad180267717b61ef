"""Build the --py-files artifact for cluster launch.

north_rule launch shape: `spark-submit --py-files dataprofiler_spark.zip
your_job.py` — Python workers on every executor must be able to import the
package (driver-side sys.path does NOT propagate; CLAUDE.md gotcha 13), and
the zip on the executors' PYTHONPATH is the standard mechanism.

Usage:
    python -m dataprofiler_spark.package [out.zip]
then:
    spark-submit --py-files dataprofiler_spark.zip job.py
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str = "dataprofiler_spark.zip") -> str:
    """Zip the package so `import dataprofiler_spark` works from the
    archive root (zipimport layout: dataprofiler_spark/... entries).
    Deterministic entry order; skips bytecode caches."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return os.path.abspath(out_path)


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else "dataprofiler_spark.zip"))
