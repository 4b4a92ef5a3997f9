import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def cache_dir():
    from kazu_ray.state.store import ensure_default_caches

    return ensure_default_caches()


@pytest.fixture(scope="session")
def store(cache_dir):
    from kazu_ray.state.store import load_store

    return load_store(cache_dir)
