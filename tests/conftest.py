import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per harness contract)."""
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Small deterministic webpage corpus shared across tests."""
    from search_ingest_ray.corpus import write_corpus
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, num_docs=400, num_files=4, seed=42)
    return d
