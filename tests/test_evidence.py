"""Evidence-ledger enforcement (round-4, verdict weakness #1).

Every ``outputs/...`` path cited in PARITY.md / README.md / CLAUDE.md /
BASELINE.md must exist on disk AND be git-tracked, so a container restart can
never again orphan a headline claim.  tools/evidence_pending.txt may hold
citations whose restore run is in flight — the checker fails if a pending
entry's artifact has actually landed (the list can only shrink).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_every_cited_artifact_exists_and_is_tracked():
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_evidence.py")],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, (
        "evidence-ledger check failed:\n" + res.stdout + res.stderr
    )


def test_checker_catches_a_missing_citation(tmp_path, monkeypatch):
    """The checker itself must actually fail on a fabricated citation."""
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import check_evidence as ce
    finally:
        sys.path.pop(0)
    tracked = ce.git_tracked_files()
    assert not ce.resolves("outputs/does_not_exist_xyz/result.json", tracked)
    # and resolves a real tracked one
    assert ce.resolves("outputs/segmenter2/result.json", tracked)
    # brace expansion
    assert ce.expand_braces("outputs/a/{x,y}/z") == ["outputs/a/x/z", "outputs/a/y/z"]
    # a file on disk but NOT tracked must not resolve (the container-restart
    # failure mode this checker exists to prevent)
    import uuid

    scratch = REPO / "outputs" / f"_cetest_{uuid.uuid4().hex[:8]}.json"
    scratch.write_text("{}")
    try:
        assert not ce.resolves(f"outputs/{scratch.name}", tracked)
    finally:
        scratch.unlink()
