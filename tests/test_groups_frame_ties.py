"""GROUPS-frame tie semantics: the testdata has no duplicate (user, ts), so
the oracle alone can't distinguish GROUPS from ROWS — this synthetic input
plants timestamp TIES and pins that every row of a tie group sees the same
frame total (current group + 2 preceding groups)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q


def test_groups_frame_equal_within_tie_group(ray_session, tmp_path):
    # user 1: ts groups [1,1] [2] [3,3,3] [5]; values 100.. in cents steps
    ts = np.array([1, 1, 2, 3, 3, 3, 5], "datetime64[s]").astype("datetime64[us]")
    vals = [1.00, 2.00, 4.00, 8.00, 16.00, 32.00, 64.00]
    t = pa.table(
        {
            "event_id": pa.array(list(range(1, 8)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 7, pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    got = Q.events_groups_frame_sum(str(tmp_path)).to_pandas()
    # group sums (cents): g0=300, g1=400, g2=5600, g3=6400
    # frames: g0 rows -> 300; g1 -> 700; g2 rows -> 6300; g3 -> 12400
    expected = [300, 300, 700, 6300, 6300, 6300, 12400]
    assert list(got.sort_values("event_id").g3_sum_cents) == expected
