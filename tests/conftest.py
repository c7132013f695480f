import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    """Single Ray session for all tests that need one (local, 4 CPUs)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


def latlng_close(a_lat, a_lng, b_lat, b_lng):
    """The reference's epsilon-tolerant latlng equality (latlng.h:22-27)."""
    eps = 100 * np.finfo(np.float64).eps
    return (np.abs(np.asarray(a_lat) - b_lat) < eps) & (np.abs(np.asarray(a_lng) - b_lng) < eps)
