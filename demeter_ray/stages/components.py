"""Distributed connected components (dedup clustering).

Near-dup pairs (MinHash/SimHash output) or shared-key stars form an
undirected graph; the cluster id of every node is the MINIMUM node id
reachable from it — the canonical-representative rule used to collapse
duplicate groups in training-data pipelines.

Two size-gated paths (the gated_semi_join pattern):

- node set under ``cap``: labels live on the driver as a union-find array
  with path compression; edges STREAM through ``iter_batches`` (one pass,
  no edge materialization).  Driver memory is O(nodes), bounded by the cap.
- above ``cap``: iterative distributed min-label propagation — each round
  joins edge endpoints to current labels (hash shuffle), takes the
  per-node min, and pointer-jumps labels through themselves
  (label := label(label)), converging in O(log n) rounds (the public
  MapReduce-CC scheme of Kiveris et al., "Connected Components in
  MapReduce and Beyond").

Both paths return one (node, cluster_id) row per node and are
parity-tested against a brute-force union-find.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

COMPONENT_NODE_CAP = 50_000_000  # int64 label array per node: ~400MB driver heap


def _find1(parent: np.ndarray, x: int) -> int:
    """Union-find root with path compression (scalar; union-find is
    inherently sequential — this driver loop only runs under the node cap,
    where edges are candidate pairs, i.e. output-bounded)."""
    root = x
    while parent[root] != root:
        root = parent[root]
    while parent[x] != root:
        parent[x], x = root, parent[x]
    return root


def _components_streaming(edges: ray.data.Dataset, nodes: np.ndarray) -> pd.DataFrame:
    """Driver union-find over streamed edge batches (labels O(nodes))."""
    nodes = np.unique(nodes)
    parent = np.arange(len(nodes), dtype=np.int64)
    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        ui = np.searchsorted(nodes, u)
        vi = np.searchsorted(nodes, v)
        # membership check: an endpoint absent from the node set would
        # otherwise silently union the wrong node (or index past the end)
        nmax = len(nodes)
        bad = (
            (ui >= nmax) | (vi >= nmax)
            | (nodes[np.minimum(ui, nmax - 1)] != u)
            | (nodes[np.minimum(vi, nmax - 1)] != v)
        )
        if bad.any():
            k = int(np.flatnonzero(bad)[0])
            raise ValueError(
                f"connected_components: edge ({u[k]}, {v[k]}) references a "
                "node absent from nodes_ds"
            )
        for a, b in zip(ui.tolist(), vi.tolist()):
            ra, rb = _find1(parent, a), _find1(parent, b)
            if ra != rb:
                # union toward the smaller ORIGINAL node id so the root IS
                # the min id of its component
                lo, hi = (ra, rb) if nodes[ra] < nodes[rb] else (rb, ra)
                parent[hi] = lo
    roots = np.array([_find1(parent, i) for i in range(len(nodes))], dtype=np.int64)
    return pd.DataFrame({"node": nodes, "cluster_id": nodes[roots]})


def _components_distributed(
    edges: ray.data.Dataset, nodes_ds: ray.data.Dataset, max_iters: int = 64
) -> pd.DataFrame:
    """Iterative min-label propagation + pointer jumping via Dataset joins
    (every step a hash shuffle; no driver materialization until the final
    one-row-per-node result)."""
    both = edges.map_batches(
        lambda t: pa.table(
            {"src": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()]),
             "dst": pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()])}
        ),
        batch_format="pyarrow",
    ).materialize()
    labels = nodes_ds.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["node"]}),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(max_iters):
        # min neighbor label: dst -> label join, then min per src
        j = both.join(
            labels, join_type="inner", num_partitions=8, on=("dst",), right_on=("node",)
        )
        cand = (
            j.map_batches(
                lambda t: pa.table({"node": t["src"], "nbr": t["label"]}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .min(on="nbr")
        )
        merged = labels.join(
            cand, join_type="left_outer", num_partitions=8, on=("node",)
        )

        def take_min(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lab = t["label"].to_numpy(zero_copy_only=False)
            nbr = t["min(nbr)"].to_numpy(zero_copy_only=False)
            nbr = np.where(pd.isna(nbr), lab, nbr).astype(np.int64)
            new = np.minimum(lab, nbr)
            return pa.table(
                {"node": t["node"], "label": pa.array(new, pa.int64()),
                 "changed": pa.array((new != lab).astype(np.int64), pa.int64())}
            )

        updated = merged.map_batches(take_min, batch_format="pyarrow").materialize()
        changed = updated.sum(on="changed")
        labels = updated.drop_columns(["changed"]).materialize()
        if not changed:
            break
        # pointer jump: label := label(label)
        jumped = labels.join(
            labels.map_batches(
                lambda t: pa.table({"lnode": t["node"], "llabel": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=8,
            on=("label",),
            right_on=("lnode",),
        )
        labels = jumped.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["llabel"]}),
            batch_format="pyarrow",
        ).materialize()
    out = labels.to_pandas().rename(columns={"label": "cluster_id"})
    return out


def connected_components(
    edges: ray.data.Dataset,
    nodes_ds: ray.data.Dataset,
    cap: int = COMPONENT_NODE_CAP,
    max_iters: int = 64,
) -> pd.DataFrame:
    """(node, cluster_id = min reachable node id) for every node.  ``edges``
    has columns (u, v); ``nodes_ds`` a ``node`` column (isolated nodes keep
    their own id).  Path choice is size-gated on the node count."""
    n_nodes = nodes_ds.count()
    if n_nodes <= cap:
        nodes = nodes_ds.to_pandas()["node"].to_numpy(dtype=np.int64)
        out = _components_streaming(edges, nodes)
    else:
        out = _components_distributed(edges, nodes_ds, max_iters)
    return out.sort_values("node").reset_index(drop=True)
