"""Connected components (dedup clustering): both the streamed union-find
path and the distributed min-label-propagation path must match a brute
force on random graphs, including isolated nodes and long chains (the
capped-bucket degradation shape)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from demeter_ray.stages.components import connected_components


def _brute(nodes, edges):
    lbl = {n: n for n in nodes}

    def root(x):
        while lbl[x] != x:
            x = lbl[x]
        return x

    for u, v in edges:
        ru, rv = root(u), root(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            lbl[hi] = lo
    return pd.DataFrame(
        {"node": sorted(nodes), "cluster_id": [root(n) for n in sorted(nodes)]}
    )


@pytest.fixture(scope="module")
def random_graph(ray_session):
    rng = np.random.RandomState(5)
    nodes = np.arange(0, 600, dtype=np.int64) * 7 + 3  # non-dense ids
    e_idx = rng.randint(0, len(nodes), size=(500, 2))
    edges = [(int(nodes[a]), int(nodes[b])) for a, b in e_idx if a != b]
    # a long chain (capped-bucket shape) attached to nothing else
    chain_nodes = np.arange(10_000, 10_200, dtype=np.int64)
    nodes = np.concatenate([nodes, chain_nodes])
    edges += [(int(a), int(b)) for a, b in zip(chain_nodes[:-1], chain_nodes[1:])]
    edges_df = pd.DataFrame(edges, columns=["u", "v"])
    nodes_df = pd.DataFrame({"node": nodes})
    return nodes, edges, ray.data.from_pandas(edges_df), ray.data.from_pandas(nodes_df)


def test_streaming_path_matches_bruteforce(random_graph):
    nodes, edges, edges_ds, nodes_ds = random_graph
    got = connected_components(edges_ds, nodes_ds, cap=10**9)
    expect = _brute(list(map(int, nodes)), edges)
    pd.testing.assert_frame_equal(got, expect.astype({"node": "int64", "cluster_id": "int64"}))


def test_distributed_path_matches_bruteforce(random_graph):
    nodes, edges, edges_ds, nodes_ds = random_graph
    got = connected_components(edges_ds, nodes_ds, cap=0)  # force shuffle path
    expect = _brute(list(map(int, nodes)), edges)
    pd.testing.assert_frame_equal(got, expect.astype({"node": "int64", "cluster_id": "int64"}))


def test_isolated_nodes_keep_own_id(ray_session):
    edges = ray.data.from_pandas(pd.DataFrame({"u": [1], "v": [2]}))
    nodes = ray.data.from_pandas(pd.DataFrame({"node": [1, 2, 99]}))
    out = connected_components(edges, nodes)
    assert dict(zip(out["node"], out["cluster_id"])) == {1: 1, 2: 1, 99: 99}


def test_components_unknown_endpoint_raises(ray_session):
    """An edge endpoint absent from nodes_ds must fail loudly, not silently
    union the wrong node (searchsorted membership guard)."""
    import pytest
    import ray.data

    edges = ray.data.from_pandas(pd.DataFrame({"u": [1, 999], "v": [2, 1]}))
    nodes = ray.data.from_pandas(pd.DataFrame({"node": [1, 2, 3]}))
    with pytest.raises(ValueError, match="absent"):
        connected_components(edges, nodes)
