"""Regenerate the registry rotation-ledger table in COVERAGE.md
(r15, VERDICT r14 next #7). Idempotent: replaces the block between
the REGISTRY-LEDGER markers, appending it (with a heading) if the
markers are not present yet.

    python scripts/gen_ledger.py          # rewrite COVERAGE.md
    python scripts/gen_ledger.py --check  # exit 1 if stale
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openaq_data_pipeline_spark.rotation_ledger import (  # noqa: E402
    LEDGER_BEGIN,
    LEDGER_END,
    render_ledger,
)

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"
HEADING = "## Registry rotation ledger (generated)"


def updated_text() -> str:
    text = COVERAGE.read_text()
    block = render_ledger()
    if LEDGER_BEGIN in text:
        head, rest = text.split(LEDGER_BEGIN, 1)
        _, tail = rest.split(LEDGER_END, 1)
        return head + block + tail
    return text.rstrip() + f"\n\n{HEADING}\n\n{block}\n"


def main() -> int:
    new = updated_text()
    if "--check" in sys.argv:
        if new != COVERAGE.read_text():
            print("COVERAGE.md ledger is stale — run scripts/gen_ledger.py")
            return 1
        print("COVERAGE.md ledger is current")
        return 0
    COVERAGE.write_text(new)
    print(f"wrote ledger table to {COVERAGE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
