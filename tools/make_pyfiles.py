"""Package the engine for spark-submit --py-files (BASELINE.json:6
"Deployed via spark-submit --py-files on multi-executor clusters").

    python tools/make_pyfiles.py [out.zip]
    spark-submit --master <cluster> --py-files engine.zip jobs/extract.py \
        --input <transcripts> --output <catalog root>

Verified in-sandbox: running jobs/extract.py from OUTSIDE the repo with
only the zip on --py-files extracts the full fixture and commits the
snapshot manifest (see BENCH/BASELINE.md "Deployment shape").
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    pkg = REPO / "opencv_table_extraction_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            if "__pycache__" not in str(p):
                z.write(p, str(p.relative_to(REPO)))
    print(out)


if __name__ == "__main__":
    main()
