"""Shared helpers of the query registry (split from the monolithic queries.py; see __init__.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum
from ...stages import neardup
from ...stages.ann import brute_force_topk, ivf_topk, knn_join
from ...stages.fuzzy import fuzzy_reconcile
from ...stages.text_analysis import (
    fingerprint_stage,
    lang_id_stage,
    quality_stage,
    token_count_stage,
)



def _cents(arr) -> pa.Array:
    return pc.cast(
        pc.floor(pc.add(pc.multiply(pc.cast(arr, pa.float64()), 100.0), 0.5)), pa.int64()
    )


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# Several registry entries are different PROJECTIONS of the same expensive
# run (flagship verdicts / summary / spans; fuzzy verdicts / manual-link
# overlay).  The driver's correctness sweep calls each entry independently,
# so without sharing it re-executes the full pipeline once per entry.  The
# memo holds the materialized result for the lifetime of the process, keyed
# by a content fingerprint of the source parquet so regenerated testdata can
# never serve a stale run.  bench.py times the flagship through its own
# uncached path — nothing here is on a timed hot path.
_MEMO: dict = {}
