"""Round-3 curation operators: vocabulary coverage / OOV rate,
per-domain document cap, and data-mixture quota allocation.

Each test pins the Ray result against a local pandas/numpy reference on
sf0.001 (the DuckDB twins are exercised by tools/check_parity.py) plus
the operator's defining invariant (quota sum exactness, cap bound,
rank contiguity).
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q


def _docs(sf_dir, cols):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=cols).to_pandas()


def test_vocab_coverage_matches_pandas(sf_dir):
    out = Q.q_vocab_coverage(sf_dir).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    toks = docs.assign(w=docs["text"].str.split()).explode("w").dropna(subset=["w"])
    toks = toks[toks["w"] != ""]
    wc = toks.groupby("w").size().reset_index(name="c") \
        .sort_values(["c", "w"], ascending=[False, True], kind="stable")
    vocab = set(wc["w"].head(20))
    per = toks.groupby("doc_id").agg(
        n_tokens=("w", "size"),
        oov_tokens=("w", lambda s: int((~s.isin(vocab)).sum()))).reset_index()
    per["oov_permille"] = 1000 * per["oov_tokens"] // per["n_tokens"]
    per = per.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(per)
    for c in ("doc_id", "n_tokens", "oov_tokens", "oov_permille"):
        assert (out[c].to_numpy(np.int64) == per[c].to_numpy(np.int64)).all(), c
    # defining invariant: OOV never exceeds the token count
    assert (out["oov_tokens"] <= out["n_tokens"]).all()


def test_domain_cap_bound_and_rank_contiguity(sf_dir):
    cap = 7  # binds on sf0.001 (~25 docs/source)
    out = Q.q_domain_cap(sf_dir, cap=cap).to_pandas() \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    docs = _docs(sf_dir, ["doc_id", "source"])
    ref = docs.sort_values(["source", "doc_id"], kind="stable")
    ref["rk"] = ref.groupby("source", sort=False).cumcount() + 1
    ref = ref[ref["rk"] <= cap].sort_values(["source", "doc_id"]) \
        .reset_index(drop=True)
    assert len(out) == len(ref)
    assert (out["doc_id"].to_numpy() == ref["doc_id"].to_numpy()).all()
    assert (out["rk"].to_numpy() == ref["rk"].to_numpy()).all()
    # defining invariants: bound + per-source rank contiguity from 1
    g = out.groupby("source")["rk"]
    assert int(out["rk"].max()) <= cap
    assert (g.min() == 1).all()
    assert (g.max() == g.size()).all()


def test_mixture_quotas_exact_apportionment(sf_dir):
    target = 137  # deliberately not divisible: remainders must be split
    out = Q.q_mixture_quotas(sf_dir, target=target).to_pandas()
    docs = _docs(sf_dir, ["source", "lang"])
    cnt = docs.groupby(["source", "lang"]).size()
    total = int(cnt.sum())
    # sum is EXACTLY the target (largest-remainder apportionment)
    assert int(out["quota"].sum()) == target
    # every quota is floor or ceil of the real-valued share
    ref = out.set_index(["source", "lang"])
    for key, c in cnt.items():
        share = target * int(c) / total
        q = int(ref.loc[key, "quota"])
        assert q in (int(np.floor(share)), int(np.ceil(share))), (key, q, share)
    # counts round-trip
    assert (out.set_index(["source", "lang"])["cnt"].sort_index()
            == cnt.sort_index()).all()


def test_retention_matches_pandas(sf_dir):
    out = Q.q_retention(sf_dir).to_pandas() \
        .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    d = ev[["user_id", "day"]].drop_duplicates()
    first = d.groupby("user_id")["day"].min().rename("cohort_day")
    j = d.merge(first, on="user_id")
    j["day_offset"] = j["day"] - j["cohort_day"]
    ref = (j.groupby(["cohort_day", "day_offset"]).size()
           .reset_index(name="users").sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))
    assert len(out) == len(ref)
    for c in ("cohort_day", "day_offset", "users"):
        assert (out[c].to_numpy(np.int64) == ref[c].to_numpy(np.int64)).all(), c
    # day 0 of each cohort contains every user of that cohort
    day0 = out[out["day_offset"] == 0].set_index("cohort_day")["users"]
    sizes = first.value_counts().sort_index()
    assert (day0.sort_index() == sizes).all()


def test_funnel_ordered_and_monotone(sf_dir):
    out = Q.q_funnel(sf_dir).to_pandas().sort_values("step") \
        .reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    ev["ts"] = ev["ts"].astype("int64")
    prev, ref = None, []
    for typ in ("signup", "view", "click", "purchase"):
        d = ev[ev["event_type"] == typ]
        if prev is not None:
            p = d["user_id"].map(prev)
            d = d[d["ts"] > p.fillna(np.iinfo(np.int64).max)]
        cur = d.groupby("user_id")["ts"].min()
        ref.append(len(cur))
        prev = cur
    assert (out["users"].to_numpy(np.int64) == np.array(ref, np.int64)).all()
    # defining invariant: the funnel only narrows
    assert (np.diff(out["users"].to_numpy(np.int64)) <= 0).all()
