import os

import pytest


@pytest.fixture(scope="session", autouse=True)
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

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def iana_dir(tmp_path_factory):
    """Extract the reference's 22-file corpus once per session."""
    import zipfile

    root = tmp_path_factory.mktemp("iana")
    with zipfile.ZipFile(IANA_ZIP) as zp:
        zp.extractall(root)
    return os.path.join(str(root), "www.iana.org")


IANA_ZIP = "/root/reference/test/www.iana.org.zip"
