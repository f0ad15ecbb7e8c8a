"""D8 flow accumulation: brute path-following twin plus conservation
invariants (every cell drains to exactly one sink)."""

import numpy as np

from osmquadtreepostgis_ray import queries as Q


def test_flow_accum_matches_brute_and_conserves(sf_dir):
    out = Q.q_flow_accum(sf_dir).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    ids = out["id"].to_numpy(np.int64)
    n = out["n"].to_numpy(np.int64)
    tgt = out["tgt"].to_numpy(np.int64)
    sink = out["is_sink"].to_numpy(bool)
    acc = out["acc"].to_numpy(np.int64)
    assert len(out) > 0 and (acc >= 1).all()
    # sinks self-target; non-sinks strictly descend in count
    assert (tgt[sink] == ids[sink]).all()
    idx = {int(i): k for k, i in enumerate(ids)}
    t_ix = np.array([idx[int(t)] for t in tgt])
    assert (n[t_ix[~sink]] < n[~sink]).all()
    # brute: walk every cell's path to its sink, count visits
    visits = np.zeros(len(ids), np.int64)
    for k in range(len(ids)):
        c = k
        visits[c] += 1
        while not sink[c]:
            c = t_ix[c]
            visits[c] += 1
    assert (visits == acc).all()
    # conservation: the sinks' accumulations partition all cells
    assert acc[sink].sum() == len(ids)
    # local recurrence: acc = 1 + sum of children's acc
    child_sum = np.zeros(len(ids), np.int64)
    np.add.at(child_sum, t_ix[~sink], acc[~sink])
    assert (acc == 1 + child_sum).all()
