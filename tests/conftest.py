import pytest

from osm_addr_bot_spark.datagen import ensure_dataset
from osm_addr_bot_spark.session import get_spark

SYNTH_DIR = "/tmp/osm_addr_bot_synth/test"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth_dir():
    return str(ensure_dataset(SYNTH_DIR, n_docs=300, seed=42))


@pytest.fixture(scope="session")
def documents(spark, synth_dir):
    return spark.read.parquet(f"{synth_dir}/documents.parquet")


def tags_df(spark, cases):
    """[(case_id, {tags})] -> DataFrame(case_id, tags)."""
    return spark.createDataFrame(
        [(cid, tags) for cid, tags in cases], "case_id string, tags map<string,string>"
    )
