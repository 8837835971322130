import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from agentic_doc_ray.context import tune_context

    tune_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_smoke_corpus():
    """Deterministic ~60-doc corpus derived from the sf0.001 documents table."""
    from agentic_doc_ray.synth import build_corpus_table

    return build_corpus_table("/root/testdata/sf0.001/documents.parquet", limit=60)
