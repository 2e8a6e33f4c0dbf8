"""docs/REFERENCE_PARITY.md hygiene: the ADR-clause parity map stays
auditable only if its citations resolve. Every `tests/<file>.py::<test>`
pin must name a real test function, every cited `q_*` query must be in
the registry, and every repo file path must exist — so renames/deletes
fail here instead of silently rotting the map."""

import re
from pathlib import Path

_REPO = Path(__file__).parent.parent
_DOC = _REPO / "docs" / "REFERENCE_PARITY.md"


def test_cited_pytests_and_queries_resolve():
    text = _DOC.read_text()

    pins = set(re.findall(r"tests/(\w+\.py)::(\w+)", text))
    assert pins, "no test citations found — wrong doc?"
    missing = []
    for fname, func in pins:
        path = _REPO / "tests" / fname
        if not path.exists():
            missing.append(f"{fname} (file gone)")
        elif f"def {func}(" not in path.read_text():
            missing.append(f"{fname}::{func}")
    assert missing == [], f"REFERENCE_PARITY.md cites missing tests: {missing}"

    import __spark_entry__ as entry

    qs = entry.queries()
    cited_queries = set(re.findall(r"\bq_\w+", text))
    unknown = sorted(q for q in cited_queries if q not in qs)
    assert unknown == [], f"REFERENCE_PARITY.md cites unregistered queries: {unknown}"

    repo_files = set(re.findall(r"\b((?:simple_stream_processor_spark|streaming|operators)/[\w/]+\.py)", text))
    gone = sorted(
        f
        for f in repo_files
        if not (_REPO / f).exists()
        and not (_REPO / "simple_stream_processor_spark" / f).exists()
    )
    assert gone == [], f"REFERENCE_PARITY.md cites missing files: {gone}"
