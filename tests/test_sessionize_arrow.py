"""Arrow-native events_sessionize (VERDICT r3 #5): dtype asserts + a serial
re-derivation of the gap-split session windows."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines.queries import events_sessionize

SF = "/root/testdata/sf0.001"
GAP_US = 30 * 60 * 1_000_000


def test_sessionize_dtypes_and_values(ray_session):
    out = events_sessionize(SF)
    sch = out.schema()
    sch = getattr(sch, "base_schema", sch)
    ev_sch = pq.read_schema(f"{SF}/events.parquet")
    assert sch.field("user_id").type == ev_sch.field("user_id").type
    for c in ("session_idx", "n_events", "start_us", "end_us"):
        assert sch.field(c).type == pa.int64(), c

    df = out.to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    # serial oracle: per-user sorted gap split
    got = df.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    rows = []
    for uid, g in ev.groupby("user_id", sort=True):
        ts = np.sort(g["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        brk = np.r_[True, np.diff(ts) > GAP_US]
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:], len(ts)]
        for i, (s, e) in enumerate(zip(starts, ends)):
            rows.append((uid, i, e - s, ts[s], ts[e - 1]))
    assert len(got) == len(rows)
    exp = sorted(rows)
    chk = list(
        got[["user_id", "session_idx", "n_events", "start_us", "end_us"]]
        .itertuples(index=False, name=None)
    )
    assert sorted(chk) == exp
    # sessions partition events: per-user n_events sums to the user's rows
    per_user = df.groupby("user_id")["n_events"].sum()
    counts = ev.groupby("user_id").size()
    assert per_user.sort_index().equals(counts.sort_index().astype("int64"))
