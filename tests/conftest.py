from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vrtility_spark import datagen, schema  # noqa: E402
from vrtility_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vrtility-tests", cores=int(os.environ.get("TEST_CORES", "8")),
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_images_pdf():
    # 3 zones x 2x2 tiles x 5 dates, 16x16 px — the "tiny" fixture scale
    return datagen.images_pandas(nx=2, ny=2, w=16, h=16)


@pytest.fixture(scope="session")
def tiny_images(spark, tiny_images_pdf):
    return schema.images_df(spark, tiny_images_pdf).cache()


@pytest.fixture(scope="session")
def hls_images_pdf():
    return datagen.images_pandas(profile="hls", nx=2, ny=2, w=16, h=16)


@pytest.fixture(scope="session")
def tiny_aoi_pdf():
    return datagen.aoi_pandas(nx=2, ny=2)


@pytest.fixture(scope="session")
def tiny_aoi(spark, tiny_aoi_pdf):
    return schema.aoi_df(spark, tiny_aoi_pdf)
