import shutil
import tempfile

import pytest

from splade_easy_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_index(tmp_path):
    d = tmp_path / "index"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
