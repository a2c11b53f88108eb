"""Session-scoped Ray fixture: init ONCE per pytest session."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Deterministic synthetic tokens corpus (FIXTURES.md §1), built once."""
    from metaprofi_ray.sources.synth import generate_corpus

    d = tmp_path_factory.mktemp("corpus")
    return generate_corpus(str(d), n_sources=8, docs_total=1000, k=8)
