"""PQ encode vs a plain-Python reference encoder.

The DuckDB oracle pins cross-engine equality on the fixture; this pins the
KERNEL SEMANTICS on generated inputs: for arbitrary quantized vectors, a
sequential restatement of the whole pipeline — salted-md5 sample codebook,
per-subspace integer squared-L2 argmin with lowest-codeword tiebreak,
distortion sum — must produce byte-identical codes. Engine-independent, so
it also guards the shared-derivation blind spot (both engines could state
the same wrong argmin; a third, loop-written implementation cannot share
that mistake)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_hdfs_spark.pipeline import pq

DIM = pq.M * pq.SUB


def reference_encode(vecs: dict[int, list[int]]):
    order = sorted(
        vecs, key=lambda vid: (hashlib.md5(f"pq|{vid}".encode()).hexdigest(), vid)
    )
    cb = [vecs[vid] for vid in order[: pq.KW]]
    out = {}
    for vid, x in vecs.items():
        codes, distortion = [], 0
        for m in range(pq.M):
            lo, hi = m * pq.SUB, (m + 1) * pq.SUB
            d, k = min(
                (sum((a - b) * (a - b) for a, b in zip(x[lo:hi], c[lo:hi])), k)
                for k, c in enumerate(cb)
            )
            codes.append(k)
            distortion += d
        out[vid] = (tuple(codes), distortion)
    return out


# small component range keeps squared distances readable; duplicates are
# deliberately likely so the argmin tiebreak path is exercised
component = st.integers(min_value=-3, max_value=3)
vector = st.lists(component, min_size=DIM, max_size=DIM)
corpus = st.dictionaries(
    st.integers(min_value=0, max_value=10_000), vector, min_size=1, max_size=30
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus)
def test_encode_matches_sequential_reference(spark, vecs):
    xe = spark.createDataFrame(
        [(vid, v) for vid, v in vecs.items()], "vec_id LONG, xe ARRAY<LONG>"
    )
    got = {
        r.vec_id: (
            tuple(r[f"code_{m}"] for m in range(pq.M)),
            r.distortion,
        )
        for r in pq._encoded(xe)
        .select("vec_id", *[f"code_{m}" for m in range(pq.M)], "distortion")
        .collect()
    }
    assert got == reference_encode(vecs)
