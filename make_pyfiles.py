"""Package libfilter_spark for ``spark-submit --py-files``.

Usage:
    python make_pyfiles.py [out.zip]
    spark-submit --py-files libfilter_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "libfilter_spark.zip"
    root = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(root, "libfilter_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    print(f"wrote {out} ({os.path.getsize(out):,} bytes)")


if __name__ == "__main__":
    main()
