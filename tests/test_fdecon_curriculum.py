"""Fuzzy decontamination + curriculum ordering: brute references."""

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q


def _grams(text: str, n: int = 3) -> set:
    toks = text.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_fuzzy_decontam_matches_brute(sf_dir):
    out = Q.q_fuzzy_decontam(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    bench = {int(r.doc_id): _grams(r.text)
             for r in docs[docs.doc_id % 50 == 0].itertuples()
             if _grams(r.text)}
    rows = []
    for r in docs[docs.doc_id % 50 != 0].itertuples():
        g = _grams(r.text)
        best = None
        for bid in sorted(bench):
            inter = len(g & bench[bid])
            union = len(g | bench[bid])
            j = Fraction(inter, union) if union else Fraction(0)
            if best is None or j > best[0]:
                best = (j, bid, inter, union)
        if best and best[2] > 0:
            flag = int(Q.FDECON_DEN * best[2] >= Q.FDECON_NUM * best[3])
            rows.append((int(r.doc_id), best[1], best[2], best[3], flag))
    ref = pd.DataFrame(rows, columns=["doc_id", "bench_id", "inter_n",
                                      "union_n", "flagged"]) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(ref) and ref["flagged"].sum() >= 0
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_curriculum_matches_brute(sf_dir):
    out = Q.q_curriculum(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    nt = docs["text"].str.split().str.len().to_numpy()
    b = np.where(nt < Q.CURR_EASY, 0, np.where(nt < Q.CURR_MED, 1, 2))
    df = pd.DataFrame({"doc_id": docs["doc_id"], "bucket": b}) \
        .sort_values(["bucket", "doc_id"])
    df["rn"] = df.groupby("bucket").cumcount()
    df["pos"] = 3 * df["rn"] + df["bucket"]
    ref = df[["doc_id", "bucket", "pos"]] \
        .sort_values("doc_id").reset_index(drop=True)
    # positions are unique within- and round-robin across buckets
    assert ref["pos"].is_unique and set(ref["bucket"]) == {0, 1, 2}
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
