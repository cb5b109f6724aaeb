"""Package the library for ``spark-submit --py-files``.

Usage: python tools/make_pyfiles_zip.py /tmp/rdfa_kg.zip
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "rdfa_streaming_parser_js_spark"


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/rdfa_kg.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(PKG.rglob("*.py")):
            zf.write(py, py.relative_to(ROOT))
        for data in sorted(PKG.rglob("*.json")):
            zf.write(data, data.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
