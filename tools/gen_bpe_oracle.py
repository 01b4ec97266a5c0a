"""CLI wrapper for the independent BPE oracle generator (the logic
lives in weather_analysis_bigdata__spark/operators/bpe_reference.py so
the registry can build the oracles lazily from the current corpus).

Usage: python tools/gen_bpe_oracle.py [sf_dir]   # prints both oracles
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_analysis_bigdata__spark.operators.bpe_reference import (  # noqa: E402
    apply_oracle_sql,
    train_oracle_sql,
)

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    print("-- bpe_train_merges oracle")
    print(train_oracle_sql(sf))
    print("-- bpe_apply_tokenize oracle")
    print(apply_oracle_sql(sf))
