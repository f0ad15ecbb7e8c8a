"""Batch: fertility, k_anon, tile_edge_census, audio_silence — brute
references from the raw tables / synthesized corpora."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.sources import audio as A
from osmquadtreepostgis_ray.stages.audio import SILENCE_T


def test_fertility_matches_brute(sf_dir):
    out = Q.q_fertility(sf_dir).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    d = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["text", "lang", "n_chars"]).to_pandas()
    d["tok"] = d["text"].str.split(" ").str.len()
    ref = d.groupby("lang").agg(sum_tokens=("tok", "sum"),
                                sum_chars=("n_chars", "sum")).reset_index()
    ref["fert_milli"] = ref["sum_tokens"] * 1000 // ref["sum_chars"]
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_k_anon_matches_brute(sf_dir):
    out = Q.q_k_anon(sf_dir).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.KANON_DEPTH)
    cell = quadtree.encode_ixy(ix, iy, Q.KANON_DEPTH)
    uc = pd.DataFrame({"user_id": ev["user_id"], "cell": cell}) \
        .groupby(["user_id", "cell"]).size().reset_index(name="n")
    uc = uc.sort_values(["user_id", "n", "cell"],
                        ascending=[True, False, True])
    home = uc.drop_duplicates("user_id")
    hc = home.groupby("cell").size()
    k = np.minimum(hc.to_numpy(np.int64), Q.KANON_CAP)
    ref = pd.DataFrame({"k": k, "nu": hc.to_numpy(np.int64)}) \
        .groupby("k").agg(n_cells=("nu", "size"),
                          n_users=("nu", "sum")).reset_index()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert int(out["n_users"].sum()) == ev["user_id"].nunique()


def test_tile_edge_census_invariants(sf_dir):
    out = Q.q_tile_edge_census(sf_dir).to_pandas()
    base = Q.q_rasterize(sf_dir).to_pandas()
    ring = base[(base["px"].isin([0, 15])) | (base["py"].isin([0, 15]))]
    ref_edge = ring.groupby("tile")["n"].sum()
    m = out.set_index("tile")
    for tile, n_e in ref_edge.items():
        assert m.loc[tile, "n_edge"] == n_e
    assert int(out["n_total"].sum()) == int(base["n"].sum())
    assert (out["n_edge"] <= out["n_total"]).all()


def test_audio_silence_matches_brute(sf_dir):
    out = Q.q_audio_silence(sf_dir).to_pandas() \
        .sort_values("audio_id").reset_index(drop=True)
    ids = np.sort(pq.read_table(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"])
                  .column("doc_id").to_numpy())
    ph = geotag.phash_of(ids)
    ns = A.n_samples_of(ids)
    fmts = A.fmt_of(ids)
    rows = []
    for i, d in enumerate(ids):
        ref = A.synth_samples_batch(np.array([ph[i]], np.uint64),
                                    int(ns[i]))[0].astype(np.int64)
        if fmts[i] == "q8":
            q = (ref + 32768) >> 8
            ref = (q << 8) - 32768 + 128
        z = np.abs(ref) <= SILENCE_T
        if not z.any():
            continue
        starts = z & ~np.r_[False, z[:-1]]
        cs = np.cumsum(z)
        reset = np.where(~z, cs, 0)
        run = cs - np.maximum.accumulate(reset)
        rows.append((f"aud{d:012d}", int(starts.sum()),
                     int(run.max()), int(z.sum())))
    ref_df = pd.DataFrame(rows, columns=["audio_id", "n_runs",
                                         "max_run", "n_silent"]) \
        .sort_values("audio_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref_df, check_dtype=False)


def test_bpe_merges_golden(tmp_path):
    """q_bpe_merges equals an independent list-of-symbols BPE reference
    (no string machinery — validates the canonical run-parity merge)
    on a corpus with multi-char merged symbols, back-to-back pair
    occurrences (mama/ababab), and the (n DESC, a, b) tie-break."""
    import pyarrow as pa

    texts = ["low low low low lower lower newest newest newest",
             "widest widest newest lowest, lowest!",
             # back-to-back pair occurrences (mama/ababab): the case a
             # plain ' a b '->' ab ' replace gets wrong — the canonical
             # run-parity merge must handle it
             "mama mama mamam ababab papapa"]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))

    from osmquadtreepostgis_ray.functions.text import BPE_TOKEN_RE
    from osmquadtreepostgis_ray.queries import q_bpe_merges
    import re

    # independent reference: words as symbol LISTS, left-to-right
    # non-overlapping merge application
    wc = {}
    for t in texts:
        for w in re.findall(BPE_TOKEN_RE, t):
            wc[w] = wc.get(w, 0) + 1
    words = {w: list(w) for w in wc}
    want = []
    for r in range(1, 7):
        counts = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = \
                    counts.get((syms[i], syms[i + 1]), 0) + wc[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        want.append((r, a, b, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    got = q_bpe_merges(str(tmp_path)).to_pandas()
    assert list(map(tuple, got.to_numpy())) == want
    # multi-char merged symbols actually appeared (real induction, not
    # just round-0 character pairs)
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _ in want)


def test_dup_span_runs_planted(tmp_path):
    """q_dup_span_runs recovers planted duplicate spans exactly: two
    docs over DISJOINT filler alphabets (no accidental 9-gram matches)
    share one 40-char and one 15-char planted substring; a third doc
    shares nothing."""
    import pyarrow as pa

    rng = np.random.RandomState(11)
    span_a = "THE-QUICK-BROWN-FOX-JUMPS-OVER-LAZY-DOGS"   # 40 chars
    span_b = "HELLO_WORLD_XYZ"                            # 15 chars
    f1 = "".join(rng.choice(list("abcdef"), 60))
    f2 = "".join(rng.choice(list("abcdef"), 60))
    g1 = "".join(rng.choice(list("uvwxyz"), 60))
    g2 = "".join(rng.choice(list("uvwxyz"), 60))
    d1 = f1 + span_a + f2 + span_b + f1[::-1]
    d2 = g1 + span_b + g2 + span_a + g1[::-1]
    d3 = "".join(rng.choice(list("mnopqr"), 200))
    import pyarrow.parquet as _pq
    _pq.write_table(pa.table({
        "doc_id": pa.array([101, 102, 103], pa.int64()),
        "text": pa.array([d1, d2, d3], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = Q.q_dup_span_runs(str(tmp_path)).to_pandas() \
        .sort_values(["d1", "d2"]).reset_index(drop=True)
    assert got[["d1", "d2"]].values.tolist() == [[101, 102]]
    row = got.iloc[0]
    # the filler alphabets are disjoint, so EXACTLY the two planted
    # spans (plus nothing else) merge into maximal runs
    assert row["n_spans"] == 2
    assert row["max_span"] == len(span_a)
    assert row["span_chars"] == len(span_a) + len(span_b)
