"""Every evidence artifact cited from STATUS.md/README.md must exist.

Round-4 verdict found STATUS claims pointing at docs/evidence files that
were never committed (integrity regression). This check makes that class
of drift impossible: any `docs/evidence/<path>` substring appearing in the
top-level narrative docs must resolve to a real file or directory in the
tree.
"""

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = ["STATUS.md", "README.md", "docs/evidence/README.md"]
# matches docs/evidence/<path> up to a sane terminator; trailing
# punctuation from prose (`.`, `,`, `)`, backtick) is stripped below.
_REF = re.compile(r"docs/evidence/[A-Za-z0-9_\-./]+")


def _cited_paths():
    cited = set()
    for doc in DOCS:
        p = REPO / doc
        if not p.exists():
            continue
        text = p.read_text()
        for m in _REF.finditer(text):
            path = m.group(0).rstrip(".").rstrip("/")
            cited.add((doc, path))
    return sorted(cited)


@pytest.mark.quick
def test_all_cited_evidence_paths_exist():
    cited = _cited_paths()
    assert cited, "no evidence citations found — regex or docs moved?"
    missing = [(doc, path) for doc, path in cited
               if not (REPO / path).exists()]
    assert not missing, (
        "STATUS/README cite evidence artifacts that do not exist in the "
        f"tree — commit the artifact or delete the claim: {missing}")
