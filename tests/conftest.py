from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radar_log_parser_spark.codec import Vocab  # noqa: E402
from radar_log_parser_spark.config import load_config  # noqa: E402
from radar_log_parser_spark.sources.fixtures import (  # noqa: E402
    generate_corpus,
    write_fixture,
)

N_ROWS = 2000
SEED = 7
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "goldens.json")


@pytest.fixture(scope="session")
def spark():
    from radar_log_parser_spark.session import get_spark

    s = get_spark(app="radar-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fx_unit")
    write_fixture(str(d), n_rows=N_ROWS, seed=SEED)
    return str(d)


@pytest.fixture(scope="session")
def fx(fixture_dir):
    from radar_log_parser_spark.sources.fixtures import Fixture

    return Fixture(
        logs_path=os.path.join(fixture_dir, "logs.parquet"),
        vocab_path=os.path.join(fixture_dir, "vocab.json"),
        config_path=os.path.join(fixture_dir, "config.yaml"),
        sources=("Ios", "my-android-bucket"),
    )


@pytest.fixture(scope="session")
def cfg(fx):
    return load_config(fx.config_path)


@pytest.fixture(scope="session")
def vocab(fx):
    return Vocab.load(fx.vocab_path)


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(n_rows=N_ROWS, seed=SEED)


@pytest.fixture(scope="session")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def pipeline_result(spark, cfg, vocab, fx):
    from radar_log_parser_spark.plans.pipeline import Pipeline

    res = Pipeline(spark, cfg, vocab, fx.logs_path, checkpoint=False).run()
    # materialize the reused frames once for the whole test session
    for name in ("other_routed", "grouped_routed"):
        res.sinks[name] = res.sinks[name].persist()
    return res
