"""Regenerate tests/golden/goldens.json from the pure-Python oracle.

Run: python -m tests.gen_goldens
Deterministic — a test asserts regeneration matches the checked-in file.
"""

from __future__ import annotations

import json
import os

from radar_log_parser_spark.config import parse_config
from radar_log_parser_spark.sources.fixtures import FIXTURE_CONFIG_YAML, generate_corpus
from tests.oracle import analyse_corpus

from tests.conftest import GOLDEN_PATH, N_ROWS, SEED  # noqa: E402


def build() -> dict:
    import yaml

    cfg = parse_config(yaml.safe_load(FIXTURE_CONFIG_YAML))
    corpus = generate_corpus(n_rows=N_ROWS, seed=SEED)
    return analyse_corpus(corpus, cfg)


def main() -> None:
    goldens = build()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(goldens, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
