"""scripts/submit.py smoke: the --local path runs the real CLI inline (the
identical code path a cluster job executes, minus the ray.init address)."""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_submit_local_build(ray_session, tmp_path):
    from metaprofi_ray.sources.synth import generate_corpus
    from submit import main

    corpus = generate_corpus(str(tmp_path / "corpus"), n_sources=4, docs_total=300, k=8)
    idx = str(tmp_path / "idx")
    rc = main(["--local", "--", "build", corpus, idx, "--m", str(1 << 16)])
    assert rc == 0
    assert os.path.exists(os.path.join(idx, "manifest.json"))
    assert glob.glob(os.path.join(idx, "banks", "**", "*.parquet"), recursive=True)


def test_submit_requires_command():
    import pytest
    from submit import main

    with pytest.raises(SystemExit):
        main(["--local"])
