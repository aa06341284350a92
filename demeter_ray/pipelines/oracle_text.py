"""Text / embedding / image-payload queries over the driver's documents and
embeddings tables — the training-data-pipeline operator suite (dedup,
similarity search, text analysis, multimodal decode) with DuckDB oracles
where SQL can express the semantics — including full recomputes of the
MinHash/ngram funnels (exact set-Jaccard), SimHash (sha256 token hashes +
bit votes), winnowing fingerprints and language-ID — and rows-only
registration only where recall is genuinely probabilistic at scale
(embedding LSH, IVF) or the math is raster-side (warp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from demeter_ray.functions import bmp as bmpfns, codec, gif as giffns, hashing, jpeg as jpegfns, png as pngfns, text as textfns
from demeter_ray.pipelines.relational import duck_round, gated_group_sum_ds, partial_combine, partial_shuffle_combine, register
from demeter_ray.sources.tables import read_table
from demeter_ray.stages.simsearch import _emb_matrix

# ----------------------------------------------------------- token counting

_TOKSTATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(replace(text, ' ', '')) AS n_nonspace_chars,
       n_chars
FROM documents ORDER BY doc_id
"""


@register("doc_token_stats", _TOKSTATS_SQL)
def doc_token_stats(sf_dir: str):
    """Whitespace token counting, vectorized per batch (stages analog of the
    reference's filename/string parsers M13)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        batch["n_tokens"] = toks.str.len().astype("int64")
        batch["n_nonspace_chars"] = (
            batch["text"].str.replace(" ", "", regex=False).str.len().astype("int64")
        )
        return batch[["doc_id", "n_tokens", "n_nonspace_chars", "n_chars"]]

    return ds.map_batches(fn, batch_format="pandas")


_QUALITY_SQL = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '),
                       x -> x IN ('the', 'a', 'value', 'data', 'table', 'row'))) AS n_stopwords,
       len(string_split(text, ' ')) AS n_tokens,
       ROUND(len(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 4)
         AS mean_token_len
FROM documents ORDER BY doc_id
"""

_STOPSET = frozenset(["the", "a", "value", "data", "table", "row"])


@register("doc_quality_score", _QUALITY_SQL)
def doc_quality_score(sf_dir: str):
    """Quality heuristics: stopword counts + mean token length (SURVEY.md
    'text analysis' requirement)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        batch["n_stopwords"] = toks.map(
            lambda ws: sum(1 for w in ws if w in _STOPSET)
        ).astype("int64")
        batch["n_tokens"] = toks.str.len().astype("int64")
        nonspace = batch["text"].str.replace(" ", "", regex=False).str.len()
        batch["mean_token_len"] = duck_round(
            nonspace.to_numpy(dtype=np.float64) * 1.0
            / batch["n_tokens"].to_numpy(dtype=np.float64),
            4,
        )
        return batch[["doc_id", "n_stopwords", "n_tokens", "mean_token_len"]]

    return ds.map_batches(fn, batch_format="pandas")


# ------------------------------------------------------------- exact dedup

_DEDUP_SQL = """
SELECT array_to_string(string_split(text, ' ')[1:3], ' ') AS dedup_key,
       MIN(doc_id) AS doc_id,
       COUNT(*) AS n_dupes
FROM documents
GROUP BY dedup_key
ORDER BY doc_id
"""


@register("exact_dedup_docs", _DEDUP_SQL)
def exact_dedup_docs(sf_dir: str):
    """Exact deduplication: hash-partition on the content key, keep first
    (min doc_id) per group — the canonical exact-dedup shape (hash-partition
    + per-group first; SURVEY.md §2.7).  Key = first 3 tokens so the driver
    tables actually contain duplicate groups."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        batch["dedup_key"] = batch["text"].str.split(" ").str[:3].str.join(" ")
        return batch[["doc_id", "dedup_key"]]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = keyed(b)
        return b.groupby("dedup_key", as_index=False).agg(
            doc_id=("doc_id", "min"), n_dupes=("doc_id", "size")
        )

    out = (
        partial_combine(ds, partial)
        .groupby("dedup_key", as_index=False)
        .agg(doc_id=("doc_id", "min"), n_dupes=("n_dupes", "sum"))
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_LANGSRC_SQL = """
SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
ORDER BY lang, source
"""


@register("lang_source_counts", _LANGSRC_SQL)
def lang_source_counts(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["lang", "source"])

    def partial(b):
        return b.groupby(["lang", "source"], as_index=False).agg(n=("lang", "size"))

    out = partial_combine(ds, partial).groupby(["lang", "source"], as_index=False).sum()
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


# ------------------------------------------------- similarity search (ANN)

_KNN_EMB_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank,
       vec_id
FROM (
  SELECT e.vec_id, list_cosine_similarity(e.embedding, q.qv) AS sim
  FROM embeddings e, q WHERE e.vec_id <> 0
)
ORDER BY rank LIMIT 5
"""


@register("knn_embeddings_top5", _KNN_EMB_SQL)
def knn_embeddings_top5(sf_dir: str):
    """Brute-force cosine top-k against a broadcast query vector: float64
    matmul per batch, local top-k per batch, tiny global resolve.  Output is
    (rank, vec_id) only — integer columns, no float hashing hazard.  The
    IVF/LSH scale path lives in stages/simsearch.py."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qv = None
    for b in emb.iter_batches(batch_size=1024, batch_format="pyarrow"):
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        if (ids == 0).any():
            i = int(np.flatnonzero(ids == 0)[0])
            qv = np.asarray(b["embedding"][i].as_py(), dtype=np.float64)
            break
    if qv is None:
        # empty corpus (or no vec_id 0): no query vector, no neighbors
        return pd.DataFrame({"rank": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64")})
    qn = qv / np.linalg.norm(qv)
    ref = ray.put(qn)

    def topk_fn(batch: pa.Table) -> pa.Table:
        # plain task (no actor pool): the broadcast query vector is a
        # worker-cached ray.get, and stateless tasks can't starve pools
        q = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        E = _emb_matrix(batch)
        keep = ids != 0
        ids, E = ids[keep], E[keep]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sim = En @ q
        top = np.argsort(-sim, kind="stable")[:5]
        return pa.table(
            {"vec_id": pa.array(ids[top], pa.int64()),
             "sim": pa.array(sim[top], pa.float64())}
        )

    cand = emb.map_batches(topk_fn, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["sim", "vec_id"], ascending=[False, True]).head(5)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand[["rank", "vec_id"]].reset_index(drop=True)


_NEARDUP_EMB_SQL = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
ORDER BY a_id, b_id
"""


@register("embedding_neardup_pairs", _NEARDUP_EMB_SQL)
def embedding_neardup_pairs(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (threshold 0.4 sits in a gap of
    the sf0.01 similarity distribution, margin ~1e-4).  Each batch compares
    against the full broadcast normalized matrix — O(N*B) matmul; the LSH
    bucketing scale path is stages/simsearch.py."""
    emb_tbl = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = emb_tbl.to_pandas()
    if len(full) == 0:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                             "b_id": pd.Series(dtype="int64")})
    ids_all = full["vec_id"].to_numpy(dtype=np.int64)
    E = np.array(full["embedding"].tolist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    ref = ray.put((ids_all, En))

    def pairs_fn(batch: pa.Table) -> pa.Table:
        ids_full, En_full = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:  # keep the fn total: (0,0) @ (d,N) would raise
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        E = _emb_matrix(batch)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        S = En @ En_full.T
        hit_r, hit_c = np.nonzero(S >= 0.4)
        lt = ids[hit_r] < ids_full[hit_c]
        return pa.table(
            {"a_id": pa.array(ids[hit_r[lt]], pa.int64()),
             "b_id": pa.array(ids_full[hit_c[lt]], pa.int64())}
        )

    out = emb_tbl.map_batches(pairs_fn, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# --------------------------------------------------- image decode (oracle)

_IMG_SQL = """
WITH px AS (
  SELECT d.doc_id,
         ((d.doc_id * 97 + x.x * 31 + y.y * 17 + c.c * 11) % 256) AS v
  FROM documents d,
       generate_series(0, 15) AS x(x),
       generate_series(0, 15) AS y(y),
       generate_series(0, 2) AS c(c)
)
SELECT doc_id, ROUND(SUM(v) / 768.0, 4) AS mean_pixel
FROM px GROUP BY doc_id ORDER BY doc_id
"""


@register("image_decode_stats", _IMG_SQL)
def image_decode_stats(sf_dir: str):
    """Real encode->decode round trip through the binary column (actor-pool
    decode over small batches); the oracle recomputes the decoded pixel mean
    from the generator formula in pure SQL — the decode path itself is
    oracle-checked."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def encode_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = codec.encode_batch(codec.generate_pixels_batch(ids, 16, 16), "png")
        return pa.table({"doc_id": batch["doc_id"], "bytes": pa.array(blobs, pa.binary())})

    def decode_fn(batch: pa.Table) -> pa.Table:
        # batched decode (uniform 16x16 blobs), stateless task pool
        px = codec.decode_batch(batch["bytes"].to_pylist(), 16, 16)
        means = px.astype(np.int64).sum(axis=(1, 2, 3)) / 768.0
        return pa.table(
            {"doc_id": batch["doc_id"], "mean_pixel": pa.array(duck_round(means, 4))}
        )

    out = (
        ds.map_batches(encode_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(decode_fn, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------- near-dup / fingerprint / langid operators (SQL-recomputed)
#
# The LSH funnels are verified by EXACT similarity on the candidate pairs, so
# the final output is a deterministic function of the corpus alone whenever
# banding recall is 1.0 at the gate's scale — which it is here (32 bands of 4
# rows at J>=0.9: miss probability ~1e-15, checked empirically at sf0.001 and
# sf0.01 incl. the capped-bucket chains).  That makes exact set-similarity SQL
# a true oracle for the funnel's output.

_MINHASH_SQL = """
WITH toks AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM documents
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         len(list_intersect(a.ts, b.ts)) AS i,
         len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS u
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
),
j AS (
  SELECT a_id, b_id,
         CASE WHEN u = 0 THEN 1.0 ELSE round_even(i::DOUBLE / u::DOUBLE, 4) END AS jaccard
  FROM p
)
SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= 0.9 ORDER BY a_id, b_id
"""


@register("minhash_lsh_neardup_docs", _MINHASH_SQL)
def minhash_lsh_neardup_docs(sf_dir: str):
    """MinHash + LSH banding near-dup candidates, verified by exact Jaccard
    (shingle -> minhash -> band -> bucket groupby -> verify; ray_guide
    'Near-dup').  Oracle: exact word-set Jaccard over all pairs — equivalent
    because the funnel ends in an exact verify and banding recall is 1.0 at
    oracle scale (see module comment)."""
    from demeter_ray.stages.dedup import minhash_neardup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # the synthetic corpus has a tiny vocabulary, so word-set similarity
    # is high across the board; 0.9 keeps the output a real near-dup set
    return minhash_neardup(ds, num_perm=128, bands=32, jaccard_threshold=0.9)


def sha256_hash64_sql(expr: str) -> str:
    """SQL expression recomputing functions/hashing.stable_hash64(expr):
    little-endian first 8 bytes of sha256, top bit dropped (HUGEINT)."""
    return f"""(list_sum(list_transform(range(0, 8), i ->
    ((strpos('0123456789abcdef', substr(sha256({expr}), (2*i+1)::INT, 1)) - 1)::HUGEINT * 16
     + (strpos('0123456789abcdef', substr(sha256({expr}), (2*i+2)::INT, 1)) - 1)::HUGEINT)
    * ([1,256,65536,16777216,4294967296,1099511627776,281474976710656,72057594037927936][(i+1)::INT])::HUGEINT
 )) >> 1)"""


# SimHash recompute: hash every token occurrence, per-bit majority vote
# (bit set iff 2*ones > n — the strict-majority rule in hashing.simhash64),
# assembled as signed int64 (bit 63 contributes -2^63).
SIMHASH_CTE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hv AS (
  SELECT doc_id, {sha256_hash64_sql('tok')}::BIGINT AS h FROM toks
),
votes AS (
  SELECT doc_id, j, SUM(((h >> j) & 1)) AS ones, COUNT(*) AS n
  FROM hv, (SELECT unnest(range(0, 64)) AS j) js
  GROUP BY doc_id, j
),
sim AS (
  SELECT doc_id,
    SUM(CASE WHEN 2 * ones > n
             THEN CASE WHEN j = 63 THEN -9223372036854775808 ELSE (1::BIGINT << j::INT) END
             ELSE 0 END)::BIGINT AS simhash
  FROM votes GROUP BY doc_id
)
"""

_SIMHASH_SQL = SIMHASH_CTE + "SELECT doc_id, simhash FROM sim ORDER BY doc_id"


@register("simhash_docs", _SIMHASH_SQL)
def simhash_docs(sf_dir: str):
    """Per-doc 64-bit SimHash, SQL-recomputed bit-for-bit (sha256 token
    hashes + per-bit majority vote)."""
    from demeter_ray.stages.dedup import simhash_column

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_column(ds)


_NGRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(text) - 1),
                                      i -> substr(lower(text), i::INT, 3))) AS ts
  FROM documents
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         len(list_intersect(a.ts, b.ts)) AS i,
         len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS u
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
),
j AS (
  SELECT a_id, b_id,
         CASE WHEN u = 0 THEN 1.0 ELSE round_even(i::DOUBLE / u::DOUBLE, 4) END AS jaccard
  FROM p
)
SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY a_id, b_id
"""


@register("ngram_jaccard_pairs", _NGRAM_SQL)
def ngram_jaccard_pairs(sf_dir: str):
    """Character-3-gram Jaccard near-dup pairs via banded MinHash candidates
    + exact verify.  Oracle: exact 3-gram-set Jaccard over all pairs (same
    recall argument as the word-set funnel above)."""
    from demeter_ray.stages.dedup import ngram_jaccard_neardup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_neardup(ds, n=3, threshold=0.8)


# Karp-Rabin k-gram hashes (k=8, base 257, mod 2^31-1) recomputed as a
# direct polynomial with precomputed powers 257^(7-j) mod m, then winnowed
# (window-4 minima, distinct picks) — byte-exact vs functions/hashing.
# rolling_fingerprints because the corpus is ASCII (codepoint == byte).
_FINGERPRINT_SQL = """
WITH hg AS (
  SELECT doc_id,
    list_transform(range(1, len(text) - 6), i ->
      (ascii(substr(text, i::INT, 1))::BIGINT * 623063367
       + ascii(substr(text, (i+1)::INT, 1))::BIGINT * 336663071
       + ascii(substr(text, (i+2)::INT, 1))::BIGINT * 168429323
       + ascii(substr(text, (i+3)::INT, 1))::BIGINT * 67503107
       + ascii(substr(text, (i+4)::INT, 1))::BIGINT * 16974593
       + ascii(substr(text, (i+5)::INT, 1))::BIGINT * 66049
       + ascii(substr(text, (i+6)::INT, 1))::BIGINT * 257
       + ascii(substr(text, (i+7)::INT, 1))::BIGINT) % 2147483647
    ) AS hs
  FROM documents
),
w AS (
  SELECT doc_id,
    CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
         ELSE list_distinct(list_transform(range(1, len(hs) - 2),
                i -> least(hs[i::INT], hs[(i+1)::INT], hs[(i+2)::INT], hs[(i+3)::INT])))
    END AS picks
  FROM hg
)
SELECT doc_id, len(picks)::BIGINT AS n_fingerprints,
       list_min(picks)::BIGINT AS min_fingerprint
FROM w ORDER BY doc_id
"""


@register("doc_fingerprints", _FINGERPRINT_SQL)
def doc_fingerprints(sf_dir: str):
    """Winnowed rolling-hash fingerprints per doc, SQL-recomputed."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        fps = batch["text"].map(lambda t: hashing.rolling_fingerprints(t, k=8, window=4))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": fps.str.len().astype("int64"),
                "min_fingerprint": fps.map(lambda f: min(f) if f else 0).astype("int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def _langid_sql() -> str:
    """Recompute detect_language in SQL, generated from _LANG_PROFILES so the
    oracle stays in sync: per-language score = sum of non-overlapping trigram
    counts ((len - len(replace))/3 == str.count), winner = first language in
    profile order achieving the strict running max (start 'und'/0)."""
    langs = list(textfns._LANG_PROFILES)
    score_cols = ",\n    ".join(
        "(" + " + ".join(
            f"((len(t) - len(replace(t, '{g}', ''))) // 3)" for g in grams
        ) + f") AS s_{lang}"
        for lang, grams in textfns._LANG_PROFILES.items()
    )
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= 1"]
        conds += [f"s_{lang} > s_{e}" for e in langs[:i]]
        conds += [f"s_{lang} >= s_{l}" for l in langs[i + 1:]]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
WITH s AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents
),
sc AS (
  SELECT doc_id,
    {score_cols}
  FROM s
)
SELECT doc_id,
  CASE
    {' '.join(branches)}
    ELSE 'und' END AS lang_pred
FROM sc ORDER BY doc_id
"""


@register("langid_predict", _langid_sql())
def langid_predict(sf_dir: str):
    """n-gram language-ID heuristic over the text column (the synthetic text
    carries no real language signal; the operator + oracle recompute do)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = batch["text"].map(textfns.detect_language)
        return batch[["doc_id", "lang_pred"]]

    return ds.map_batches(fn, batch_format="pandas")


_COMPONENTS_SQL = """
WITH RECURSIVE keyed AS (
  SELECT doc_id,
         array_to_string(string_split(text, ' ')[1:2], ' ') AS k1,
         array_to_string(string_split(text, ' ')[2:3], ' ') AS k2
  FROM documents
),
edges AS (
  SELECT a.doc_id AS u, b.doc_id AS v FROM keyed a JOIN keyed b ON a.k1 = b.k1 AND a.doc_id <> b.doc_id
  UNION
  SELECT a.doc_id, b.doc_id FROM keyed a JOIN keyed b ON a.k2 = b.k2 AND a.doc_id <> b.doc_id
),
reach(u, v) AS (
  SELECT doc_id, doc_id FROM keyed
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u ORDER BY doc_id
"""


@register("dedup_components_docs", _COMPONENTS_SQL)
def dedup_components_docs(sf_dir: str):
    """Duplicate-cluster assignment: docs sharing either overlapping shingle
    key (tokens 1-2 or tokens 2-3) are connected; each doc's cluster id is
    the MIN doc id in its connected component — the canonical-representative
    collapse step after near-dup detection.  Engine: per-key min-anchor
    STARS (connectivity-equivalent to all in-group pairs without the O(B^2)
    blowup) + the size-gated connected-components operator; oracle: the
    same graph closed by a recursive CTE."""
    from demeter_ray.stages.components import connected_components

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ")
        b = b.assign(
            k1=toks.str[:2].str.join(" "), k2=toks.str[1:3].str.join(" ")
        )
        return b[["doc_id", "k1", "k2"]]

    keyed_ds = ds.map_batches(keyed, batch_format="pandas").materialize()

    def anchor_map(col: str) -> dict:
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            return b.groupby(col, as_index=False).agg(anchor=("doc_id", "min"))

        anchors = partial_shuffle_combine(
            keyed_ds, partial, [col], ["anchor"], batch_format="pandas", agg="min"
        )
        return dict(zip(anchors[col], anchors["anchor"]))

    import ray as _ray

    refs = {col: _ray.put(anchor_map(col)) for col in ("k1", "k2")}

    def edges_fn(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col, ref in refs.items():
            amap = _ray.get(ref)
            v = b[col].map(amap)
            frames.append(pd.DataFrame({"u": b["doc_id"], "v": v}))
        out = pd.concat(frames, ignore_index=True)
        return out[out["u"] != out["v"]].astype({"u": "int64", "v": "int64"})

    edges = keyed_ds.map_batches(edges_fn, batch_format="pandas")
    nodes = keyed_ds.map_batches(
        lambda b: b[["doc_id"]].rename(columns={"doc_id": "node"}),
        batch_format="pandas",
    )
    out = connected_components(edges, nodes)
    return out.rename(columns={"node": "doc_id"})


_FRAMES_SQL = """
WITH px AS (
  SELECT d.doc_id, k.k AS frame_idx,
         (((d.doc_id * 31 + k.k) * 97 + x.x * 31 + y.y * 17 + c.c * 11) % 256) AS v
  FROM documents d,
       (VALUES (0), (2), (4)) AS k(k),
       generate_series(0, 7) AS x(x),
       generate_series(0, 7) AS y(y),
       generate_series(0, 2) AS c(c)
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       ROUND(SUM(v) / 192.0, 4) AS mean_pixel
FROM px GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx
"""


@register("video_frame_sample", _FRAMES_SQL)
def video_frame_sample(sf_dir: str):
    """Multimodal video path: synthesize a 6-frame container per doc
    (concatenated encoded frames — the opaque-binary-column pattern),
    frame-sample every 2nd frame (stages/images.sample_frames), emit one
    row per sampled frame with its decoded pixel mean.  The oracle
    recomputes the sampled frames' means from the generator formula in
    pure SQL, so the container offsets / stride / per-frame decode are all
    oracle-checked."""
    from demeter_ray.stages.images import sample_frames

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def build_containers(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = []
        for i in ids:
            frames = codec.generate_pixels_batch(
                int(i) * 31 + np.arange(6, dtype=np.int64), 8, 8
            )
            blobs.append(b"".join(codec.encode_batch(frames, "png")))
        return pa.table(
            {"doc_id": batch["doc_id"], "video": pa.array(blobs, pa.binary())}
        )

    def sample_and_stats(batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_mean = [], [], []
        for i, blob in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False), batch["video"].to_pylist()
        ):
            frames = sample_frames(blob, every=2)
            for j, px in enumerate(frames):
                out_id.append(int(i))
                out_idx.append(j * 2)
                out_mean.append(px.astype(np.int64).sum() / 192.0)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "mean_pixel": pa.array(duck_round(np.array(out_mean), 4)),
            }
        )

    out = (
        ds.map_batches(build_containers, batch_format="pyarrow", batch_size=256)
        .map_batches(sample_and_stats, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


_AVI_SQL = """
WITH px AS (
  SELECT d.doc_id, k.k AS frame_idx,
         (((d.doc_id * 37 + k.k) * 97 + x.x * 31 + y.y * 17 + c.c * 11) % 256) AS v
  FROM documents d,
       (VALUES (0), (3), (6)) AS k(k),
       generate_series(0, 7) AS x(x),
       generate_series(0, 7) AS y(y),
       generate_series(0, 2) AS c(c)
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(8 AS BIGINT) AS n_frames, TRUE AS mjpg_ok,
       ROUND(SUM(v) / 192.0, 4) AS mean_pixel
FROM px GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx
"""


@register("avi_frame_sample", _AVI_SQL)
def avi_frame_sample(sf_dir: str):
    """REAL video container path (functions/avi.py): per doc, build an
    8-frame RIFF/AVI with an uncompressed DIB stream, frame-sample every
    3rd frame THROUGH THE idx1 INDEX (sample_frames dispatches on the RIFF
    magic), and emit each sampled frame's exact pixel mean plus the
    header-only frame count.  The same frames also roundtrip through an
    MJPG (real JPEG chunks) container in-stage: index sampling must agree
    with the DIB decode at PSNR >= 40 dB (the north rule's bar) and the
    two containers' metadata must match — ``mjpg_ok`` carries that assert
    into the driver compare.  The oracle recomputes the sampled frames'
    means from the generator formula in pure SQL."""
    from demeter_ray.functions import avi as avifns
    from demeter_ray.stages.images import sample_frames

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_n, out_ok, out_mean = [], [], [], [], []
        for i in ids:
            frames = codec.generate_pixels_batch(
                int(i) * 37 + np.arange(8, dtype=np.int64), 8, 8
            )
            blob = avifns.encode_avi(frames, fps=10, codec="dib")
            sampled = sample_frames(blob, every=3)
            assert len(sampled) == 3 and all(
                (s == frames[j * 3]).all() for j, s in enumerate(sampled)
            ), "DIB index sampling diverged from source frames"
            n = avifns.avi_frame_count(blob)
            mj = avifns.encode_avi(frames, fps=10, codec="mjpg")
            mj_frames = avifns.sample_avi_frames(mj, every=3)
            err = mj_frames.astype(np.int64) - frames[::3].astype(np.int64)
            mse = float(np.mean(np.square(err)))
            psnr = np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)
            ok = (
                psnr >= 40.0
                and avifns.avi_meta(mj)["codec"] == b"MJPG"
                and avifns.avi_frame_count(mj) == n
                and avifns.avi_dims(mj) == avifns.avi_dims(blob)
            )
            assert ok, f"MJPG container invariant failed for doc {i}"
            for j, s in enumerate(sampled):
                out_id.append(int(i))
                out_idx.append(j * 3)
                out_n.append(n)
                out_ok.append(bool(ok))
                out_mean.append(s.astype(np.int64).sum() / 192.0)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "n_frames": pa.array(out_n, pa.int64()),
                "mjpg_ok": pa.array(out_ok, pa.bool_()),
                "mean_pixel": pa.array(duck_round(np.array(out_mean), 4)),
            }
        )

    out = ds.map_batches(per_doc, batch_format="pyarrow", batch_size=128).to_pandas()
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


@register("embedding_lsh_neardup", None)
def embedding_lsh_neardup(sf_dir: str):
    """Distributed scale path of embedding_neardup_pairs: random-hyperplane
    LSH banding + groupby shuffle + in-bucket exact cosine verify.
    Precision is exact (the verify is exact cosine); recall vs the O(N^2)
    oracle measured 0.97 at sf0.01 (rows-only; parity bound pinned in
    tests/test_simsearch.py)."""
    from demeter_ray.stages.simsearch import lsh_cosine_neardup

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = lsh_cosine_neardup(ds, threshold=0.4)
    return out[["a_id", "b_id"]]


_QUANTILE_SQL = """
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS q50,
       ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS q90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("quantiles_quantity_by_flag", _QUANTILE_SQL)
def quantiles_quantity_by_flag(sf_dir: str):
    """Exact distributed quantiles via the mergeable count-histogram sketch
    (values are domain-bounded integers, so the histogram is exact and tiny;
    interpolation matches SQL QUANTILE_CONT)."""
    from demeter_ray.stages.sketches import grouped_exact_quantiles

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return grouped_exact_quantiles(ds, "l_returnflag", "l_quantity", [0.5, 0.9])


_SPLIT_SQL = """
SELECT lang,
       CASE WHEN (doc_id * 2654435761) % 97 < 78 THEN 'train'
            WHEN (doc_id * 2654435761) % 97 < 88 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang, split
ORDER BY lang, split
"""


@register("stratified_split_docs", _SPLIT_SQL)
def stratified_split_docs(sf_dir: str):
    """Deterministic train/val/test split (80/10/10-ish via a multiplicative
    hash of the id — the reproducible dataset-split every training pipeline
    needs; no RNG state, any worker computes the same split), summarized per
    language stratum."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = (b["doc_id"].to_numpy(dtype=np.int64) * 2654435761) % 97
        split = np.where(h < 78, "train", np.where(h < 88, "val", "test"))
        g = b.assign(split=split).groupby(["lang", "split"], as_index=False).agg(
            n_docs=("doc_id", "size")
        )
        return g

    out = partial_shuffle_combine(
        ds, partial, ["lang", "split"], ["n_docs"], batch_format="pandas"
    )
    return out.sort_values(["lang", "split"]).reset_index(drop=True)


# ---------------- image exposure / contrast quality gate (image axis)

_IMG_EXPOSURE_SQL = """
WITH luma AS (
  SELECT d.doc_id,
         299 * ((d.doc_id * 97 + x.x * 31 + y.y * 17) % 256)
       + 587 * ((d.doc_id * 97 + x.x * 31 + y.y * 17 + 11) % 256)
       + 114 * ((d.doc_id * 97 + x.x * 31 + y.y * 17 + 22) % 256) AS l1000
  FROM documents d,
       generate_series(0, 15) AS x(x),
       generate_series(0, 15) AS y(y)
),
stats AS (
  SELECT doc_id, SUM(l1000) AS s, MAX(l1000) - MIN(l1000) AS r
  FROM luma GROUP BY doc_id
)
SELECT doc_id,
       ROUND(s / 256000.0, 3) AS mean_luma,
       ROUND(r / 1000.0, 3) AS luma_range
FROM stats
WHERE s BETWEEN 32500000 AND 32650000 AND r >= 232000
ORDER BY doc_id
"""


@register("image_exposure_filter", _IMG_EXPOSURE_SQL)
def image_exposure_filter(sf_dir: str):
    """Image quality gate (the image-axis analog of doc_quality_score): a
    real encode->decode round trip through the binary column, integer
    Rec.601 luma (299r+587g+114b, x1000 fixed point), then an exposure +
    contrast filter whose compares all happen in the INTEGER domain (the
    thresholds sit INSIDE the generator's narrow luma spread so the gate
    genuinely splits the corpus) — no float-order ulp can flip a row vs the
    oracle's recompute of the generator formula.  Streams: per-batch decode
    + filter, output bounded by kept rows."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def encode_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = codec.encode_batch(codec.generate_pixels_batch(ids, 16, 16), "png")
        return pa.table({"doc_id": batch["doc_id"], "bytes": pa.array(blobs, pa.binary())})

    def gate(batch: pa.Table) -> pa.Table:
        px = codec.decode_batch(batch["bytes"].to_pylist(), 16, 16).astype(np.int64)
        l1000 = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]  # (N,16,16)
        flat = l1000.reshape(len(px), 256)  # explicit: reshape(0, -1) raises
        s = flat.sum(axis=1)
        r = flat.max(axis=1) - flat.min(axis=1)
        keep = (s >= 32_500_000) & (s <= 32_650_000) & (r >= 232_000)
        return pa.table({
            "doc_id": batch["doc_id"].filter(pa.array(keep)),
            "mean_luma": pa.array(duck_round(s[keep] / 256000.0, 3)),
            "luma_range": pa.array(duck_round(r[keep] / 1000.0, 3)),
        })

    out = (
        ds.map_batches(encode_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(gate, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------- vocabulary statistics: document frequency + IDF (tf-idf core)

_VOCAB_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
clean AS (SELECT doc_id, token FROM toks WHERE token <> ''),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT token,
       COUNT(DISTINCT doc_id) AS df,
       COUNT(*) AS tf,
       ROUND(LN(n.n_docs / COUNT(DISTINCT doc_id)), 6) AS idf
FROM clean, n
GROUP BY token, n.n_docs
ORDER BY df DESC, token
LIMIT 50
"""


@register("vocab_df_idf_top50", _VOCAB_SQL)
def vocab_df_idf_top50(sf_dir: str):
    """Corpus vocabulary statistics — the TF-IDF building block every
    training-data pipeline needs.  One row per document means within-row
    token dedup IS exact distinct-doc counting, so the per-batch partials
    (token, df, tf) are slim and the vocabulary-cardinality combine routes
    through the size gate; above the gate each token lands in exactly one
    block, so per-block local top-k bounds what the driver sees.  Token
    rule (lower + single-space split, empty dropped) matches the SQL's
    string_split exactly."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()

    def tok_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b["text"].str.lower().str.split(" ")
        e = b[["doc_id"]].join(s.rename("token")).explode("token")
        e = e[(e["token"].notna()) & (e["token"] != "")]
        tf = e.groupby("token", as_index=False).agg(tf=("token", "size"))
        df = e.drop_duplicates(["doc_id", "token"]).groupby(
            "token", as_index=False).agg(df=("token", "size"))
        return df.merge(tf, on="token")

    counts = gated_group_sum_ds(ds, tok_partial, ["token"], ["df", "tf"])

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["df", "token"], ascending=[False, True]).head(50)

    top = counts.map_batches(local_topk, batch_format="pandas").to_pandas()
    top = top.sort_values(["df", "token"], ascending=[False, True]).head(50)
    top["idf"] = duck_round(np.log(n_docs / top["df"].to_numpy(dtype=np.float64)), 6)
    top = top.astype({"df": "int64", "tf": "int64"})
    return top[["token", "df", "tf", "idf"]].reset_index(drop=True)


# ---------------- per-document top TF-IDF keyword

_TOP_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
clean AS (SELECT doc_id, token FROM toks WHERE token <> ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM clean GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM clean GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf * LN(n.n_docs / df.df) AS score
  FROM tf JOIN df USING (token), n
)
SELECT doc_id, token AS top_term
FROM (SELECT doc_id, token,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token ASC) AS rn
      FROM scored)
WHERE rn = 1
ORDER BY doc_id
"""


@register("doc_top_tfidf_term", _TOP_TFIDF_SQL)
def doc_top_tfidf_term(sf_dir: str):
    """Per-document keyword extraction: argmax of tf * idf with (score DESC,
    token ASC) tie-break.  Document locality is structural (one row = one
    doc), so tf and the argmax are batch-local and vectorized; the only
    corpus-wide piece is the document-frequency map, built by the size-gated
    distributed combine and broadcast once via ray.put (at vocabularies past
    the broadcast cap the same plan swaps the broadcast for a token-key
    lookup join + doc-key argmax shuffle — the documented partitioning
    assumption)."""
    import ray as _ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b["text"].str.lower().str.split(" ")
        e = b[["doc_id"]].join(s.rename("token")).explode("token")
        e = e[(e["token"].notna()) & (e["token"] != "")]
        return e.drop_duplicates(["doc_id", "token"]).groupby(
            "token", as_index=False).agg(df=("token", "size"))

    df_map = gated_group_sum_ds(ds, df_partial, ["token"], ["df"]).to_pandas()
    idf = dict(zip(df_map["token"], np.log(n_docs / df_map["df"].to_numpy(np.float64))))
    ref = _ray.put(idf)

    def top_term(b: pd.DataFrame) -> pd.DataFrame:
        idfm = _ray.get(ref)
        s = b["text"].str.lower().str.split(" ")
        e = b[["doc_id"]].join(s.rename("token")).explode("token")
        e = e[(e["token"].notna()) & (e["token"] != "")]
        tf = e.groupby(["doc_id", "token"], as_index=False).agg(tf=("token", "size"))
        tf["score"] = tf["tf"].to_numpy(np.float64) * tf["token"].map(idfm).to_numpy(np.float64)
        tf = tf.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True], kind="mergesort")
        top = tf.drop_duplicates("doc_id")
        return pd.DataFrame({"doc_id": top["doc_id"],
                             "top_term": top["token"]})

    out = ds.map_batches(top_term, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------- order-independent table checksum (data validation)

_CHECKSUM_SQL = f"""
SELECT COUNT(*) AS n_rows,
       (SUM({sha256_hash64_sql(
           "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
       )}) % 9007199254740881)::BIGINT AS key_checksum
FROM lineitem
"""


@register("table_checksum_lineitem", _CHECKSUM_SQL)
def table_checksum_lineitem(sf_dir: str):
    """Order-independent table fingerprint — the cheap data-integrity
    primitive a 100-TB pipeline runs after every copy/repartition/resume:
    per-row sha256-derived key hash summed modulo a 53-bit prime (addition
    commutes, so block order / parallelism never changes the answer; any
    dropped or duplicated row does).  One (count, sum) pair per batch to the
    driver; Python-int accumulation so the 63-bit hash sum never wraps."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    MOD = 9007199254740881  # largest prime < 2^53

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = (b["l_orderkey"].astype(str) + "|" + b["l_linenumber"].astype(str))
        tot = 0
        for k in keys:
            tot += hashing.stable_hash64(k)
        return pd.DataFrame({"n_rows": [len(b)], "ck": [tot % MOD]})

    parts = partial_combine(ds, partial)
    ck = int(sum(int(v) for v in parts["ck"]) % MOD)
    return pd.DataFrame({"n_rows": pd.array([int(parts["n_rows"].sum())], dtype="int64"),
                         "key_checksum": pd.array([ck], dtype="int64")})


@register("kmeans_embedding_clusters", None)
def kmeans_embedding_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the embedding corpus (rows-only by
    semantics: an iterative float algorithm has no SQL equivalent — the
    driver's weaker ran-and-returned-rows check applies; determinism and
    quality are pinned by tests/test_simsearch.py instead).  Output: one row
    per cluster with size and mean cosine to the centroid."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray as _ray
    from demeter_ray.sources.tables import read_table
    from demeter_ray.stages.simsearch import (
        _assign_nearest,
        _emb_matrix,
        _normalize,
        distributed_kmeans,
    )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    C, assigned = distributed_kmeans(ds, k=8, iters=5)

    ref = _ray.put(C)

    def stats(batch: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        E = _normalize(_emb_matrix(batch))
        a = _assign_nearest(E, c)
        sims = np.einsum("ij,ij->i", E, c[a])
        df = pd.DataFrame({"cluster": a, "n": 1, "s": sims}).groupby(
            "cluster", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    g = parts.groupby("cluster", as_index=False).sum()
    out = pd.DataFrame({
        "cluster": g["cluster"].astype("int64"),
        "size": g["n"].astype("int64"),
        "mean_sim": (g["s"] / g["n"]).round(6),
    })
    return out.sort_values("cluster").reset_index(drop=True)


# ---------------- sequence packing: greedy docs -> fixed context windows

_PACK_N = 256  # window size in whitespace tokens

_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents
),
c AS (
  SELECT doc_id, ntok,
         COALESCE(SUM(ntok) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS off
  FROM t
)
SELECT CAST(off // {_PACK_N} AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY 1 ORDER BY 1
"""


@register("pack_documents_context_windows", _PACK_SQL)
def pack_documents_context_windows(sf_dir: str):
    """Greedy sequential sequence packing — the LLM-training step that
    concatenates documents (in stable doc_id order) into fixed-size token
    windows: a doc lands in chunk floor(exclusive_token_offset / N).

    Distributed via the running-sum shape (relational.running_sum_per_user):
    one range-partitioned sort on doc_id, O(blocks) token-count partials to
    the driver for exclusive per-block base offsets, then a second
    vectorized pass over the SAME materialized blocks assigns chunk ids and
    emits per-(block, chunk) partials; the final per-chunk reduction is a
    size-gated combine keyed on chunk_id (chunk count is
    total_tokens / N — combine-friendly at any corpus size)."""
    import pyarrow.compute as pc

    from demeter_ray.pipelines.relational import partial_shuffle_combine

    sorted_ds = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .sort("doc_id")
        .materialize()
    )

    def block_tokens(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_doc": pa.array([], pa.int64()),
                             "tok_sum": pa.array([], pa.int64())})
        # segments of ' '-split = spaces + 1 (== SQL len(string_split))
        ntok = pc.add(pc.count_substring(t["text"], " "), 1)
        return pa.table({
            "first_doc": pa.array([t["doc_id"][0].as_py()], pa.int64()),
            "tok_sum": pa.array([pc.sum(ntok).as_py() or 0], pa.int64()),
        })

    from demeter_ray.pipelines.relational import partial_combine

    parts = (partial_combine(sorted_ds, block_tokens, "pyarrow",
                             batch_size=None)
             .sort_values("first_doc").reset_index(drop=True))
    bases = np.r_[0, np.cumsum(parts["tok_sum"].to_numpy())[:-1]].astype(np.int64)
    base_by_first = {int(f): int(b) for f, b in zip(parts["first_doc"], bases)}
    import ray as _ray

    ref = _ray.put(base_by_first)

    def chunk_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"chunk_id": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "total_tokens": pa.array([], pa.int64()),
                             "first_doc": pa.array([], pa.int64()),
                             "last_doc": pa.array([], pa.int64())})
        basemap = _ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = (pc.add(pc.count_substring(t["text"], " "), 1)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        off = basemap[int(ids[0])] + np.r_[0, np.cumsum(ntok)[:-1]]
        chunk = off // _PACK_N
        df = pd.DataFrame({"chunk_id": chunk, "n_docs": 1,
                           "total_tokens": ntok,
                           "first_doc": ids, "last_doc": ids})
        g = df.groupby("chunk_id", as_index=False).agg(
            n_docs=("n_docs", "sum"), total_tokens=("total_tokens", "sum"),
            first_doc=("first_doc", "min"), last_doc=("last_doc", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = partial_shuffle_combine(
        sorted_ds, chunk_partial,
        ["chunk_id"], ["n_docs", "total_tokens", "first_doc", "last_doc"],
        batch_format="pyarrow", mb_kwargs={"batch_size": None},
        agg={"n_docs": "sum", "total_tokens": "sum",
             "first_doc": "min", "last_doc": "max"},
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("chunk_id").reset_index(drop=True)


# ---------------- train/test n-gram contamination (decontamination check)

_CONTAM_W = 8  # shingle width in tokens

_CONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
),
sh AS (
  SELECT doc_id, array_to_string(tk[i:i+{_CONTAM_W - 1}], ' ') AS g
  FROM toks, UNNEST(range(1, len(tk) - {_CONTAM_W - 2})) AS u(i)
),
lab AS (
  SELECT doc_id, g, (doc_id * 2654435761) % 97 >= 88 AS is_test FROM sh
),
train_g AS (SELECT DISTINCT g FROM lab WHERE NOT is_test),
test_pairs AS (SELECT DISTINCT doc_id, g FROM lab WHERE is_test)
SELECT t.doc_id, COUNT(*) AS n_shared
FROM test_pairs t JOIN train_g tr USING (g)
GROUP BY t.doc_id ORDER BY t.doc_id
"""


@register("ngram_contamination_check", _CONTAM_SQL)
def ngram_contamination_check(sf_dir: str):
    """Train/test contamination: which TEST documents share any 8-token
    shingle with ANY train document (the decontamination pass every
    benchmark-clean training corpus needs).  Split = the deterministic
    multiplicative hash of stratified_split_docs (test = top ~10%).

    Distributed shape: per-batch shingling emits slim (doc_id, ghash,
    is_test) rows hashed with stable_hash64 (sha256 — string-identical
    shingles collide iff a 63-bit sha collision fires, and the SQL oracle
    joins on the raw string, so parity itself verifies no collision);
    the train side reduces to a distinct-hash key set and the test pairs
    semi-join it through the size-gated broadcast/shuffle plan
    (gated_semi_join) — no shingle STRING ever shuffles."""
    from demeter_ray.pipelines.relational import gated_semi_join

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def shingles(b: pd.DataFrame, want_test: bool) -> pd.DataFrame:
        h = (b["doc_id"].to_numpy(dtype=np.int64) * 2654435761) % 97
        sel = (h >= 88) if want_test else (h < 88)
        ids, ghs = [], []
        for did, txt in zip(b["doc_id"].to_numpy()[sel],
                            b["text"].to_numpy()[sel]):
            toks = txt.lower().split(" ")
            grams = {" ".join(toks[i:i + _CONTAM_W])
                     for i in range(len(toks) - _CONTAM_W + 1)}
            for g in grams:
                ids.append(int(did))
                ghs.append(hashing.stable_hash64(g))
        return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                             "ghash": np.array(ghs, dtype=np.int64)})

    def train_partial(b: pd.DataFrame) -> pd.DataFrame:
        p = shingles(b, want_test=False)[["ghash"]].drop_duplicates()
        return p.assign(c=np.int64(1))

    # distinct train shingle hashes: gated_group_sum_ds returns a DATASET
    # that stays distributed above the driver cap (the train shingle
    # vocabulary is roughly one hash per train token — it must never
    # round-trip through driver memory at corpus scale)
    train_hashes = gated_group_sum_ds(
        ds, train_partial, ["ghash"], ["c"], agg="min"
    ).map_batches(lambda t: t.select(["ghash"]), batch_format="pyarrow")

    test_pairs = ds.map_batches(
        lambda b: shingles(b, want_test=True), batch_format="pandas")
    hits = gated_semi_join(test_pairs, "ghash", train_hashes, "ghash")

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        # (doc_id, ghash) pairs are distinct by construction (set per doc,
        # one row per doc per batch), so size == distinct shared shingles
        return b.groupby("doc_id", as_index=False).agg(
            n_shared=("ghash", "size"))

    out = partial_shuffle_combine(hits, count_partial, ["doc_id"],
                                  ["n_shared"], batch_format="pandas")
    out["n_shared"] = out["n_shared"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------- repetition ratio: duplicated-n-gram corpus-quality rule

_REP_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
),
g AS (
  SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
       ROUND(1.0 - COUNT(DISTINCT g) * 1.0 / COUNT(*), 6) AS rep_ratio
FROM g GROUP BY doc_id ORDER BY doc_id
"""


@register("doc_repetition_ratio", _REP_SQL)
def doc_repetition_ratio(sf_dir: str):
    """Per-document duplicated-bigram fraction — the Gopher-style repetition
    quality rule corpus filters apply before training (a doc whose n-grams
    repeat heavily is boilerplate/spam).  One row = one doc, so the whole
    statistic is batch-local and the output is O(docs): no shuffle at all —
    the structural-locality fast path every per-document metric shares."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        n_grams = np.empty(len(b), dtype=np.int64)
        n_dist = np.empty(len(b), dtype=np.int64)
        for k, txt in enumerate(b["text"].to_numpy()):
            toks = txt.lower().split(" ")
            grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
            n_grams[k] = len(grams)
            n_dist[k] = len(set(grams))
        keep = n_grams > 0  # single-token docs have no bigram group in SQL
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy()[keep],
            "n_grams": n_grams[keep],
            "n_distinct": n_dist[keep],
            "rep_ratio": duck_round(1.0 - n_dist[keep] / n_grams[keep], 6),
        })

    return ds.map_batches(fn, batch_format="pandas")


# ------------- int8 scalar quantization of the embedding column (ANN prep)

_QUANT_SQL = """
WITH v AS (
  -- FLOAT[] storage: cast to DOUBLE so every arithmetic step below runs
  -- in float64 exactly like the numpy side (float32 subtraction would
  -- diverge in the last bits)
  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
         UNNEST(range(1, len(embedding) + 1)) AS i
  FROM embeddings
),
s AS (SELECT i AS dim, MIN(x) AS lo, MAX(x) AS hi FROM v GROUP BY i),
q AS (
  SELECT v.i AS dim, lo, hi,
         ROUND((x - lo) * 255.0 / (hi - lo)) AS code,
         ABS(ROUND((x - lo) * 255.0 / (hi - lo)) * (hi - lo) / 255.0 + lo - x)
           AS abs_err
  FROM v JOIN s ON v.i = s.dim
)
SELECT dim, ROUND(lo, 6) AS lo, ROUND(hi, 6) AS hi,
       CAST(SUM(CASE WHEN code = 0 OR code = 255 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_saturated,
       ROUND(MAX(abs_err), 9) AS max_abs_err
FROM q GROUP BY dim, lo, hi ORDER BY dim
"""


@register("embedding_int8_quantization", _QUANT_SQL)
def embedding_int8_quantization(sf_dir: str):
    """Int8 scalar quantization of the embedding column — the compression
    step vector indexes apply before ANN serving (4x memory cut).  Two
    streaming passes, both dim-bounded: (1) per-dim lo/hi from mergeable
    min/max partials; (2) broadcast (lo, hi), per-batch quantize + count
    saturated codes + track max reconstruction error — every reported
    statistic (min, max, count, max-err) is ORDER-INSENSITIVE, so the
    distributed reduction is bit-deterministic and SQL-matchable (an
    AVG-of-floats would float-drift under re-associated sums).  The code
    arithmetic uses half-away rounding (duck_round) to match SQL ROUND."""
    import ray as _ray

    from demeter_ray.pipelines.relational import partial_combine

    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def minmax_partial(t: pa.Table) -> pa.Table:
        E = _emb_matrix(t)
        if E.shape[0] == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({
            "dim": pa.array(np.arange(1, E.shape[1] + 1), pa.int64()),
            "lo": pa.array(E.min(axis=0), pa.float64()),
            "hi": pa.array(E.max(axis=0), pa.float64()),
        })

    mm = (partial_combine(ds, minmax_partial, "pyarrow")
          .groupby("dim", as_index=False).agg(lo=("lo", "min"), hi=("hi", "max")))
    if len(mm) == 0:
        return pd.DataFrame({"dim": pd.Series(dtype="int64"),
                             "lo": pd.Series(dtype="float64"),
                             "hi": pd.Series(dtype="float64"),
                             "n_saturated": pd.Series(dtype="int64"),
                             "max_abs_err": pd.Series(dtype="float64")})
    lo = mm.sort_values("dim")["lo"].to_numpy(np.float64)
    hi = mm.sort_values("dim")["hi"].to_numpy(np.float64)
    ref = _ray.put((lo, hi))

    def quant_partial(t: pa.Table) -> pa.Table:
        l, h = _ray.get(ref)
        E = _emb_matrix(t)
        if E.shape[0] == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n_saturated": pa.array([], pa.int64()),
                             "max_abs_err": pa.array([], pa.float64())})
        code = duck_round((E - l) * 255.0 / (h - l), 0)
        abs_err = np.abs(code * (h - l) / 255.0 + l - E)
        return pa.table({
            "dim": pa.array(np.arange(1, E.shape[1] + 1), pa.int64()),
            "n_saturated": pa.array(
                ((code == 0) | (code == 255)).sum(axis=0).astype(np.int64),
                pa.int64()),
            "max_abs_err": pa.array(abs_err.max(axis=0), pa.float64()),
        })

    parts = partial_combine(ds, quant_partial, "pyarrow")
    g = parts.groupby("dim", as_index=False).agg(
        n_saturated=("n_saturated", "sum"), max_abs_err=("max_abs_err", "max"))
    out = pd.DataFrame({
        "dim": g["dim"].astype("int64"),
        "lo": duck_round(lo, 6),
        "hi": duck_round(hi, 6),
        "n_saturated": g["n_saturated"].astype("int64"),
        "max_abs_err": duck_round(g["max_abs_err"].to_numpy(np.float64), 9),
    })
    return out.sort_values("dim").reset_index(drop=True)


# ------------- BPE-ish regex token counting (driver token-count req #2)

_BPE_TOK_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+'))
            AS BIGINT) AS n_bpe_tokens,
       len(string_split(text, ' ')) AS n_ws_tokens
FROM documents ORDER BY doc_id
"""


@register("bpe_token_counts", _BPE_TOK_SQL)
def bpe_token_counts(sf_dir: str):
    """Token counting with the BPE-ish regex (functions/text.BPE_RE: word /
    number / punctuation runs) beside the whitespace count — the two
    token-budget estimates a training pipeline tracks.  The compiled
    pattern lives at module scope (compiled once per worker process, not
    per batch); the oracle recomputes with the identical RE2-compatible
    pattern via regexp_extract_all."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].to_numpy()
        n_bpe = np.fromiter(
            (len(textfns.BPE_RE.findall(t)) for t in texts),
            dtype=np.int64, count=len(texts))
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_bpe_tokens": n_bpe,
            "n_ws_tokens": b["text"].str.count(" ").to_numpy(np.int64) + 1,
        })

    return ds.map_batches(fn, batch_format="pandas")


# ------------------- image patch-grid pooling (brightest-chip selection)

_PATCH_SQL = """
WITH px AS (
  SELECT d.doc_id, y.y // 4 AS py, x.x // 4 AS px,
         CASE WHEN d.doc_id % 2 = 0
              THEN (d.doc_id * 97 + x.x * 31 + y.y * 17 + c.c * 11) % 256
              ELSE ((d.doc_id * 97 + x.x * 31 + y.y * 17 + c.c * 11) % 256)
                   // 4 * 4 + 2
         END AS v
  FROM documents d,
       generate_series(0, 15) AS x(x),
       generate_series(0, 15) AS y(y),
       generate_series(0, 2) AS c(c)
),
pm AS (
  SELECT doc_id, py, px, SUM(v) / 48.0 AS pmean
  FROM px GROUP BY doc_id, py, px
),
r AS (
  SELECT doc_id, py, px, pmean,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY pmean DESC, py, px) AS rn,
         MIN(pmean) OVER (PARTITION BY doc_id) AS worst
  FROM pm
)
SELECT doc_id, py AS best_py, px AS best_px, pmean AS best_mean,
       pmean - worst AS patch_contrast
FROM r WHERE rn = 1 ORDER BY doc_id
"""


@register("image_patch_brightest", _PATCH_SQL)
def image_patch_brightest(sf_dir: str):
    """Patch-grid pooling + brightest-chip selection — the vision-training
    step that splits each image into a PxP grid of patches (here 4x4 patches
    of 4x4 px) and picks the most exposed one per image (tie -> lowest patch
    index).  Exercises the LOSSY decode branch end-to-end: odd doc_ids are
    encoded DJPG q=4 and the oracle recomputes the quantized reconstruction
    (v//4*4+2) in SQL.  Patch means are integer-sum / 48.0 — one float op on
    identical integers, so the whole query is exact with NO rounding.
    Distributed shape: encode + decode + pool are each vectorized
    map_batches over the binary column; per-image argmax happens inside the
    batch (images never split across batches), so nothing shuffles."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def encode_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        px4 = codec.generate_pixels_batch(ids, 16, 16)
        even = ids % 2 == 0
        blobs = np.empty(len(ids), dtype=object)
        if even.any():
            blobs[even] = codec.encode_batch(px4[even], "png")
        if (~even).any():
            blobs[~even] = codec.encode_batch(px4[~even], "djpg", q=4)
        return pa.table(
            {"doc_id": batch["doc_id"], "bytes": pa.array(list(blobs), pa.binary())}
        )

    def pool_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        px4 = codec.decode_batch(batch["bytes"].to_pylist(), 16, 16)
        # (N,16,16,3) -> (N, py, px) integer patch sums over 4x4x3 blocks
        sums = (
            px4.astype(np.int64)
            .reshape(len(ids), 4, 4, 4, 4, 3)
            .sum(axis=(2, 4, 5))
        )
        means = sums / 48.0
        flat = means.reshape(len(ids), 16)
        # argmax with tie -> lowest (py,px): first occurrence of the max
        best = np.argmax(flat, axis=1)
        rows = np.arange(len(ids))
        worst = flat.min(axis=1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "best_py": pa.array(best // 4, pa.int64()),
                "best_px": pa.array(best % 4, pa.int64()),
                "best_mean": pa.array(flat[rows, best], pa.float64()),
                "patch_contrast": pa.array(flat[rows, best] - worst, pa.float64()),
            }
        )

    out = (
        ds.map_batches(encode_fn, batch_format="pyarrow", batch_size=512)
        .map_batches(pool_fn, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------- document chunking (sliding window with overlap)

_CHUNK_C = 64  # window length in whitespace tokens
_CHUNK_S = 48  # stride (C - S = 16 tokens of overlap)

_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
n AS (SELECT doc_id, ts, len(ts) AS ntok FROM t),
s AS (
  SELECT doc_id, ntok, ts,
         UNNEST(generate_series(0, (ntok - 1) // {_CHUNK_S})) AS ci
  FROM n
)
SELECT doc_id, ci AS chunk_idx, (ci * {_CHUNK_S})::BIGINT AS start_tok,
       (LEAST(ci * {_CHUNK_S} + {_CHUNK_C}, ntok) - ci * {_CHUNK_S})::BIGINT
         AS chunk_len,
       ts[CAST(ci * {_CHUNK_S} + 1 AS BIGINT)] AS first_tok
FROM s ORDER BY doc_id, chunk_idx
"""


@register("chunk_documents_overlap", _CHUNK_SQL)
def chunk_documents_overlap(sf_dir: str):
    """Sliding-window document chunking — the RAG / training-data step that
    splits each document into C-token windows advancing by stride S (overlap
    C-S), emitting per chunk its start offset, actual length (tail chunks
    truncate) and first token.  Pure flat_map shape: one vectorized
    map_batches expands each doc into its chunks with np.repeat + a
    list-offset gather for the first tokens — no shuffle, no per-row Python,
    output streams.  All-integer + string columns: exact, no rounding."""
    import pyarrow.compute as pc

    C, S = _CHUNK_C, _CHUNK_S
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def expand(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "start_tok": pa.array([], pa.int64()),
                    "chunk_len": pa.array([], pa.int64()),
                    "first_tok": pa.array([], pa.string()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(batch["text"], pattern=" ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        ntok = (
            pc.add(pc.count_substring(batch["text"], " "), 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        nchunks = (ntok - 1) // S + 1
        doc_rep = np.repeat(np.arange(len(ids)), nchunks)
        # per-chunk index within its doc: global arange minus each doc's base
        base = np.r_[0, np.cumsum(nchunks)[:-1]]
        ci = np.arange(nchunks.sum(), dtype=np.int64) - np.repeat(base, nchunks)
        start = ci * S
        clen = np.minimum(start + C, ntok[doc_rep]) - start
        # first token of each chunk: list-offset gather from the flat values
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        first = pc.take(toks.values, pa.array(offs[doc_rep] + start, pa.int64()))
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_rep], pa.int64()),
                "chunk_idx": pa.array(ci, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "chunk_len": pa.array(clen, pa.int64()),
                "first_tok": first.cast(pa.string()),
            }
        )

    out = ds.map_batches(expand, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


# -------------- image augmentation: horizontal flip + perceptual-hash drift

_AUG_SQL = """
WITH px AS (
  SELECT d.doc_id AS i, x.x, y.y,
         (d.doc_id * 97 + x.x * 31 + y.y * 17) % 256 AS b,
         (d.doc_id * 97 + (15 - x.x) * 31 + y.y * 17) % 256 AS bf
  FROM documents d, generate_series(0, 15) x(x), generate_series(0, 15) y(y)
),
blk AS (
  -- 3*gray summed per 2x2 block (channel residues +0/+11/+22), both the
  -- original and the horizontally flipped image; the threshold compare is
  -- exact-rational: block_mean > grand_mean  <=>  s3 * 64 > t3
  SELECT i, y // 2 AS by, x // 2 AS bx,
         SUM(b + (b + 11) % 256 + (b + 22) % 256) AS s3,
         SUM(bf + (bf + 11) % 256 + (bf + 22) % 256) AS f3
  FROM px GROUP BY i, y // 2, x // 2
),
tot AS (SELECT i, SUM(s3) AS t3, SUM(f3) AS tf3 FROM blk GROUP BY i),
ph AS (
  SELECT i,
    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
         THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS phash,
    CAST(CASE WHEN sf >= 9223372036854775808::HUGEINT
         THEN sf - 18446744073709551616::HUGEINT ELSE sf END AS BIGINT)
      AS phash_flip
  FROM (
    SELECT b.i,
      SUM(CASE WHEN b.s3 * 64 > t.t3 THEN 1::HUGEINT ELSE 0::HUGEINT END
          * (1::HUGEINT << CAST(63 - (b.by * 8 + b.bx) AS INT))) AS s,
      SUM(CASE WHEN b.f3 * 64 > t.tf3 THEN 1::HUGEINT ELSE 0::HUGEINT END
          * (1::HUGEINT << CAST(63 - (b.by * 8 + b.bx) AS INT))) AS sf
    FROM blk b JOIN tot t USING (i) GROUP BY b.i)
)
SELECT i AS doc_id, phash, phash_flip,
       bit_count(xor(phash, phash_flip))::BIGINT AS hamming
FROM ph ORDER BY doc_id
"""


@register("image_augment_phash", _AUG_SQL)
def image_augment_phash(sf_dir: str):
    """Augmentation invariance audit — the training-data QA step that
    measures how far a geometric augmentation (horizontal flip) moves each
    image's perceptual hash: decode through the REAL codec roundtrip, flip
    with one vectorized axis reversal, hash BOTH variants with the
    integer-exact phash64_int_batch (bit-stable at block==grand-mean ties,
    where the float-mean variant depends on division rounding), and emit the
    per-image Hamming drift.  Everything is one
    stateless map_batches chain over the binary column (encode -> decode ->
    flip -> two phashes -> popcount), nothing shuffles.  Oracle: the
    flagship's exact-rational phash SQL (blocks3*64 > total3) evaluated for
    both the original and the x -> 15-x formula image, Hamming via
    bit_count(xor()) — all-integer, no rounding."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def aug_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = codec.encode_batch(codec.generate_pixels_batch(ids, 16, 16), "png")
        px4 = codec.decode_batch(blobs, 16, 16)
        ph = codec.phash64_int_batch(px4)
        phf = codec.phash64_int_batch(px4[:, :, ::-1, :])
        x = np.bitwise_xor(ph.view(np.uint64), phf.view(np.uint64))
        ham = np.unpackbits(x.view(np.uint8).reshape(len(ids), 8), axis=1).sum(
            axis=1, dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "phash": pa.array(ph, pa.int64()),
                "phash_flip": pa.array(phf, pa.int64()),
                "hamming": pa.array(ham, pa.int64()),
            }
        )

    out = ds.map_batches(aug_fn, batch_format="pyarrow", batch_size=512).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------- image histogram equalization (contrast normalization)

_EQ_SQL = """
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 97 + x.x * 31 + y.y * 17 + c.c * 11) % 256 AS v
  FROM documents d,
       generate_series(0, 15) AS x(x),
       generate_series(0, 15) AS y(y),
       generate_series(0, 2) AS c(c)
),
h AS (SELECT doc_id, v, COUNT(*) AS cnt FROM px GROUP BY doc_id, v),
cdf AS (
  SELECT doc_id, v,
         SUM(cnt) OVER (PARTITION BY doc_id ORDER BY v) AS cum
  FROM h
),
e AS (
  SELECT p.doc_id, (c.cum * 255) // 768 AS ev
  FROM px p JOIN cdf c ON c.doc_id = p.doc_id AND c.v = p.v
)
SELECT doc_id, SUM(ev) / 768.0 AS eq_mean,
       MIN(ev)::BIGINT AS eq_min, MAX(ev)::BIGINT AS eq_max
FROM e GROUP BY doc_id ORDER BY doc_id
"""


@register("image_hist_equalize_stats", _EQ_SQL)
def image_hist_equalize_stats(sf_dir: str):
    """Per-image histogram equalization (the classic contrast-normalization
    preprocessing step): decode through the codec roundtrip, build each
    image's 256-bin intensity histogram, remap every pixel through the
    integer CDF (v' = cdf(v)*255 // npix) and emit the equalized mean/min/
    max.  The whole batch vectorizes as ONE bincount over offset-packed
    (image, value) codes + a cumsum gather — no per-image Python.  All
    integer until the final /768.0 — exact, no rounding."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def eq_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:  # reshape(0, -1) is ambiguous — keep the fn total
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "eq_mean": pa.array([], pa.float64()),
                "eq_min": pa.array([], pa.int64()),
                "eq_max": pa.array([], pa.int64()),
            })
        blobs = codec.encode_batch(codec.generate_pixels_batch(ids, 16, 16), "png")
        px4 = codec.decode_batch(blobs, 16, 16)
        v = px4.reshape(n, 768).astype(np.int64)  # 16*16*3 per image
        codes = (np.arange(n, dtype=np.int64)[:, None] * 256 + v).ravel()
        hist = np.bincount(codes, minlength=n * 256).reshape(n, 256)
        cdf = np.cumsum(hist, axis=1)
        ev = (np.take_along_axis(cdf, v, axis=1) * 255) // 768
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "eq_mean": pa.array(ev.sum(axis=1) / 768.0, pa.float64()),
                "eq_min": pa.array(ev.min(axis=1, initial=255), pa.int64()),
                "eq_max": pa.array(ev.max(axis=1, initial=0), pa.int64()),
            }
        )

    out = ds.map_batches(eq_fn, batch_format="pyarrow", batch_size=512).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ------------------- inverted-index postings (search-index build step)

_POSTING_TERMS = ("merge", "spark", "table", "window")

_POSTINGS_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
u AS (
  SELECT doc_id, ts,
         UNNEST([{", ".join(repr(t) for t in _POSTING_TERMS)}]) AS term
  FROM t
)
SELECT term, doc_id,
       len(list_filter(ts, x -> x = term))::BIGINT AS tf,
       list_position(ts, term)::BIGINT AS first_pos
FROM u WHERE list_position(ts, term) > 0
ORDER BY term, doc_id
"""


@register("inverted_index_postings", _POSTINGS_SQL)
def inverted_index_postings(sf_dir: str):
    """Inverted-index posting extraction (the search/retrieval index build
    step): for a broadcast query vocabulary, every (term, doc) posting
    with term frequency and 1-based first position.  One vectorized
    map_batches pass: split once per batch, then per term a flat equality
    scan + bincount for tf and a minimum.at scatter for first positions —
    no per-document Python, postings stream out partitioned by the
    batch's doc range (at index scale the postings sort/partition by term
    downstream; here term count is fixed so the pass is shuffle-free).
    All-integer + string.  oracle-exact."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = _POSTING_TERMS

    def postings(batch: pa.Table) -> pa.Table:
        empty = {
            "term": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "first_pos": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0:
            return pa.table(empty)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        toks = pc.split_pattern(batch["text"], pattern=" ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        docidx = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat_pos = np.arange(len(docidx), dtype=np.int64) - offs[:-1][docidx] + 1
        out_t, out_d, out_tf, out_fp = [], [], [], []
        for term in terms:
            hit = pc.equal(toks.values, term).to_numpy(zero_copy_only=False)
            hit = np.nan_to_num(hit).astype(bool) if hit.dtype != bool else hit
            tf = np.bincount(docidx[hit], minlength=n)
            first = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(first, docidx[hit], flat_pos[hit])
            has = tf > 0
            out_t.append(np.full(int(has.sum()), term, dtype=object))
            out_d.append(ids[has])
            out_tf.append(tf[has].astype(np.int64))
            out_fp.append(first[has])
        return pa.table({
            "term": pa.array(np.concatenate(out_t), pa.string()),
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            "tf": pa.array(np.concatenate(out_tf), pa.int64()),
            "first_pos": pa.array(np.concatenate(out_fp), pa.int64()),
        })

    out = ds.map_batches(postings, batch_format="pyarrow").to_pandas()
    return out.sort_values(["term", "doc_id"]).reset_index(drop=True)


# ---------------- embedding covariance matrix (mergeable moment sketch)

_COV_D = 64  # embedding dimensionality in the driver tables

_COV_SQL = f"""
WITH e AS (SELECT embedding FROM embeddings),
n AS (SELECT COUNT(*) AS n FROM e),
m AS (
  SELECT i.i, SUM(CAST(embedding[i.i] AS DOUBLE)) AS s
  FROM e, generate_series(1, {_COV_D}) i(i) GROUP BY i.i
),
x AS (
  SELECT i.i, j.j,
         SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(embedding[j.j] AS DOUBLE))
           AS sxy
  FROM e, generate_series(1, {_COV_D}) i(i), generate_series(1, {_COV_D}) j(j)
  WHERE i.i <= j.j
  GROUP BY i.i, j.j
)
SELECT (x.i - 1)::BIGINT AS di, (x.j - 1)::BIGINT AS dj,
       ROUND(x.sxy / n.n - (mi.s / n.n) * (mj.s / n.n), 6) AS cov
FROM x, n
JOIN m mi ON mi.i = x.i
JOIN m mj ON mj.i = x.j
ORDER BY di, dj
"""


@register("embedding_covariance_matrix", _COV_SQL)
def embedding_covariance_matrix(sf_dir: str):
    """Population covariance matrix of the embedding columns (the PCA /
    whitening precomputation): per-batch moment partials are ONE matmul
    (E^T E, a d x d block) plus the column-sum vector, shipped as two
    binary blobs per batch — O(batches x d^2) floats to the driver, never
    a row.  The d(d+1)/2 upper triangle emits as (di, dj, cov).  float32
    inputs widen exactly to float64 on both sides; ROUND(6) absorbs
    summation order."""
    import ray as _ray

    D = _COV_D
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def moment_partial(batch: pa.Table) -> pa.Table:
        empty = {"n": pa.array([], pa.int64()),
                 "s": pa.array([], pa.binary()),
                 "xy": pa.array([], pa.binary())}
        if batch.num_rows == 0:
            return pa.table(empty)
        E = _emb_matrix(batch).astype(np.float64)
        return pa.table({
            "n": pa.array([E.shape[0]], pa.int64()),
            "s": pa.array([E.sum(axis=0).tobytes()], pa.binary()),
            "xy": pa.array([(E.T @ E).tobytes()], pa.binary()),
        })

    parts = partial_combine(ds, moment_partial, "pyarrow")
    if len(parts) == 0 or parts["n"].sum() == 0:
        return pd.DataFrame({"di": pd.Series(dtype=np.int64),
                             "dj": pd.Series(dtype=np.int64),
                             "cov": pd.Series(dtype=np.float64)})
    n = float(parts["n"].sum())
    s = np.sum([np.frombuffer(b, dtype=np.float64) for b in parts["s"]], axis=0)
    xy = np.sum([np.frombuffer(b, dtype=np.float64).reshape(D, D)
                 for b in parts["xy"]], axis=0)
    mean = s / n
    cov = xy / n - mean[:, None] * mean[None, :]
    iu, ju = np.triu_indices(D)
    return pd.DataFrame({
        "di": iu.astype(np.int64),
        "dj": ju.astype(np.int64),
        "cov": duck_round(cov[iu, ju], 6),
    }).sort_values(["di", "dj"]).reset_index(drop=True)


# -------------- real baseline-JPEG bitstreams in the loop (functions/jpeg.py)

_JPEG_SQL = """
SELECT doc_id,
       CAST(16 AS BIGINT) AS w,
       CAST(16 AS BIGINT) AS h,
       CAST((doc_id * 37) % 256 AS BIGINT) AS const_decoded,
       true AS psnr_ok
FROM documents WHERE doc_id % 10 = 3 ORDER BY doc_id
"""


@register("jpeg_roundtrip_invariant", _JPEG_SQL)
def jpeg_roundtrip_invariant(sf_dir: str):
    """Real baseline-JPEG bitstreams in the loop (functions/jpeg.py — T.81
    FDCT + Huffman entropy coding, decodable by any standard reader): for a
    1-in-10 doc slice, (a) a constant grayscale tile roundtrips BIT-EXACTLY
    (a constant block is DC-only and the ramp table's DC step is 1, so
    quantization is lossless), letting SQL recompute the decoded value from
    the generator formula; (b) the doc's gradient RGB tile must decode at
    the north rule's PSNR >= 40 dB — asserted in-stage (fail loud => driver
    failure), surfaced as psnr_ok.  Dims come from jpeg_dims header parsing
    of the real bitstream, not from input metadata."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 10 == 3]
        n = len(ids)
        ws = np.empty(n, np.int64)
        hs = np.empty(n, np.int64)
        const_dec = np.empty(n, np.int64)
        psnr_ok = np.empty(n, bool)
        for i in range(n):
            d = int(ids[i])
            const = np.full((16, 16, 1), (d * 37) % 256, np.uint8)
            cdec = jpegfns.decode_jpeg(jpegfns.encode_jpeg(const))
            u = np.unique(cdec)
            if u.size != 1:
                raise ValueError(f"constant tile not constant after jpeg roundtrip (doc {d})")
            const_dec[i] = int(u[0])
            px = codec.generate_pixels(d, 16, 16)
            buf = jpegfns.encode_jpeg(px)
            ws[i], hs[i] = jpegfns.jpeg_dims(buf)
            p = codec.psnr(jpegfns.decode_jpeg(buf), px)
            if not p >= 40.0:
                raise ValueError(f"jpeg decode psnr {p:.1f} < 40 dB (doc {d})")
            psnr_ok[i] = True
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "w": pa.array(ws, pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "const_decoded": pa.array(const_dec, pa.int64()),
            "psnr_ok": pa.array(psnr_ok, pa.bool_()),
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    if out.shape[1] == 0:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64), "w": pd.Series(dtype=np.int64),
            "h": pd.Series(dtype=np.int64),
            "const_decoded": pd.Series(dtype=np.int64),
            "psnr_ok": pd.Series(dtype=bool),
        })
    return out.sort_values("doc_id").reset_index(drop=True)


_JPEG420_SQL = """
WITH c AS (
  SELECT doc_id,
         CAST((doc_id*37)%256 AS DOUBLE) AS r,
         CAST((doc_id*59)%256 AS DOUBLE) AS g,
         CAST((doc_id*83)%256 AS DOUBLE) AS b
  FROM documents WHERE doc_id % 10 = 7),
y AS (
  SELECT doc_id,
         0.299e0*r + 0.587e0*g + 0.114e0*b AS yy,
         -0.168736e0*r - 0.331264e0*g + 0.5e0*b + 128e0 AS cb,
         0.5e0*r - 0.418688e0*g - 0.081312e0*b + 128e0 AS cr
  FROM c),
q AS (
  SELECT doc_id,
         ROUND(8e0*(yy-128e0))/8e0 + 128e0 AS yq,
         ROUND(8e0*(cb-128e0))/8e0 AS cbq,
         ROUND(8e0*(cr-128e0))/8e0 AS crq
  FROM y)
SELECT doc_id,
       CAST(LEAST(255e0, GREATEST(0e0, ROUND(yq + 1.402e0*crq))) AS BIGINT) AS r_dec,
       CAST(LEAST(255e0, GREATEST(0e0, ROUND(yq - 0.344136e0*cbq - 0.714136e0*crq))) AS BIGINT) AS g_dec,
       CAST(LEAST(255e0, GREATEST(0e0, ROUND(yq + 1.772e0*cbq))) AS BIGINT) AS b_dec
FROM q ORDER BY doc_id
"""


@register("jpeg420_roundtrip_invariant", _JPEG420_SQL)
def jpeg420_roundtrip_invariant(sf_dir: str):
    """4:2:0 chroma-subsampled + restart-interval JPEG bitstreams in the
    loop: for a 1-in-10 doc slice, a constant RGB tile encodes at
    subsampling='420' with restart_interval=1 (DRI + RSTn markers exercise
    the restart decode path per row) and must decode to per-channel
    constants that SQL recomputes end-to-end — BT.601 forward transform,
    the DC-only quantization to eighths (ramp table DC step is 1, a
    constant block has no AC), and the BT.601 inverse with round/clip.
    Constant chroma makes the 2x2 box-mean exact, so the ONLY loss is the
    DC rounding the SQL reproduces; verified tie-free across all 256
    distinct (r,g,b) residue triples.  In-stage asserts pin the stream
    shape: SOF sampling 0x22 (real subsampled MCUs), DRI present, and
    per-channel constancy — any drift fails the driver gate loudly."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 10 == 7]
        n = len(ids)
        out = np.empty((n, 3), np.int64)
        for i in range(n):
            d = int(ids[i])
            tile = np.empty((16, 16, 3), np.uint8)
            tile[:, :, 0] = (d * 37) % 256
            tile[:, :, 1] = (d * 59) % 256
            tile[:, :, 2] = (d * 83) % 256
            buf = jpegfns.encode_jpeg(tile, subsampling="420", restart_interval=1)
            k = buf.find(b"\xff\xc0")
            if buf[k + 11] != 0x22 or b"\xff\xdd" not in buf:
                raise ValueError(f"not a 4:2:0 restart stream (doc {d})")
            dec = jpegfns.decode_jpeg(buf)
            for ch in range(3):
                u = np.unique(dec[:, :, ch])
                if u.size != 1:
                    raise ValueError(
                        f"constant tile channel {ch} not constant through 420 (doc {d})"
                    )
                out[i, ch] = int(u[0])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "r_dec": pa.array(out[:, 0], pa.int64()),
            "g_dec": pa.array(out[:, 1], pa.int64()),
            "b_dec": pa.array(out[:, 2], pa.int64()),
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    if out.shape[1] == 0:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "r_dec": pd.Series(dtype=np.int64),
            "g_dec": pd.Series(dtype=np.int64),
            "b_dec": pd.Series(dtype=np.int64),
        })
    return out.sort_values("doc_id").reset_index(drop=True)


_PNG_FOREIGN_SQL = """
WITH cell AS (
  SELECT d.doc_id, ((3*x.x + 5*y.y + d.doc_id) % 16) AS idx
  FROM documents d, generate_series(0,10) x(x), generate_series(0,8) y(y)
  WHERE d.doc_id % 10 = 1)
SELECT doc_id,
  SUM((7*doc_id + 29*idx) % 256)::BIGINT AS r_sum,
  SUM((11*doc_id + 31*idx) % 256)::BIGINT AS g_sum,
  SUM((13*doc_id + 37*idx) % 256)::BIGINT AS b_sum,
  SUM(CASE WHEN idx < 8 THEN (doc_id + 19*idx) % 256 ELSE 255 END)::BIGINT AS a_sum
FROM cell GROUP BY doc_id ORDER BY doc_id
"""


@register("png_foreign_decode_invariant", _PNG_FOREIGN_SQL)
def png_foreign_decode_invariant(sf_dir: str):
    """Foreign-shape PNG decode in the driver loop: per doc (1-in-10
    slice) the stage hand-assembles an Adam7-INTERLACED, 4-bit PALETTED
    PNG with a short tRNS (odd 11x9 size: scanline padding + empty-pass
    edge cases in play) from deterministic doc_id formulas, decodes it
    through functions/png.py, and emits per-channel pixel sums that SQL
    recomputes from the same formulas — palette mapping, tRNS alpha
    (entries past the tRNS length default opaque), MSB-first sub-byte
    unpack and the interlace scatter must all be exact for the sums to
    match.  Lossless end-to-end: any decode drift fails the value hash."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    _P = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

    def fn(batch: pa.Table) -> pa.Table:
        import struct as _struct
        import zlib as _zlib

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 10 == 1]
        n = len(ids)
        sums = np.empty((n, 4), np.int64)
        w, h = 11, 9
        xg, yg = np.meshgrid(np.arange(w), np.arange(h))
        i16 = np.arange(16)
        shifts = np.array([3, 2, 1, 0])[None, :]
        for i in range(n):
            d = int(ids[i])
            idx = ((3 * xg + 5 * yg + d) % 16).astype(np.uint8)
            pal = np.stack([(7 * d + 29 * i16) % 256, (11 * d + 31 * i16) % 256,
                            (13 * d + 37 * i16) % 256], axis=1).astype(np.uint8)
            trns = ((d + 19 * np.arange(8)) % 256).astype(np.uint8)
            scan = b""
            for x0, y0, dx, dy in _P:
                sub = idx[y0::dy, x0::dx]
                ph, pw = sub.shape
                if ph == 0 or pw == 0:
                    continue
                for y in range(ph):
                    b4 = ((sub[y][:, None] >> shifts) & 1).astype(np.uint8).reshape(-1)
                    pad = (-len(b4)) % 8
                    scan += b"\x00" + np.packbits(
                        np.concatenate([b4, np.zeros(pad, np.uint8)])).tobytes()
            ihdr = _struct.pack(">IIBBBBB", w, h, 4, 3, 0, 0, 1)
            buf = (pngfns.PNG_SIG + pngfns._chunk(b"IHDR", ihdr)
                   + pngfns._chunk(b"PLTE", pal.tobytes())
                   + pngfns._chunk(b"tRNS", trns.tobytes())
                   + pngfns._chunk(b"IDAT", _zlib.compress(scan))
                   + pngfns._chunk(b"IEND", b""))
            out = pngfns.decode_png(buf)
            if out.shape != (h, w, 4):
                raise ValueError(f"foreign PNG decoded to {out.shape} (doc {d})")
            sums[i] = out.astype(np.int64).sum(axis=(0, 1))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "r_sum": pa.array(sums[:, 0], pa.int64()),
            "g_sum": pa.array(sums[:, 1], pa.int64()),
            "b_sum": pa.array(sums[:, 2], pa.int64()),
            "a_sum": pa.array(sums[:, 3], pa.int64()),
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    if out.shape[1] == 0:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "r_sum": pd.Series(dtype=np.int64), "g_sum": pd.Series(dtype=np.int64),
            "b_sum": pd.Series(dtype=np.int64), "a_sum": pd.Series(dtype=np.int64),
        })
    return out.sort_values("doc_id").reset_index(drop=True)


_GIF_SQL = """
WITH cell AS (
  SELECT d.doc_id, ((2*x.x + 3*y.y + d.doc_id) % 8) AS idx
  FROM documents d, generate_series(0,12) x(x), generate_series(0,6) y(y)
  WHERE d.doc_id % 10 = 9)
SELECT doc_id,
  SUM((5*doc_id + 23*idx) % 256)::BIGINT AS r_sum,
  SUM((7*doc_id + 41*idx) % 256)::BIGINT AS g_sum,
  SUM((11*doc_id + 53*idx) % 256)::BIGINT AS b_sum,
  (255 * SUM(CASE WHEN idx = 5 THEN 0 ELSE 1 END))::BIGINT AS a_sum
FROM cell GROUP BY doc_id ORDER BY doc_id
"""


@register("gif_foreign_decode_invariant", _GIF_SQL)
def gif_foreign_decode_invariant(sf_dir: str):
    """GIF ingest in the driver loop: per doc (1-in-10 slice) the stage
    assembles an INTERLACED GIF89a with GCE transparency from doc_id
    formulas — the entropy data is a hand-built no-compression LZW stream
    (CLEAR before every literal keeps the dictionary empty, so codes ARE
    pixel indices; fully valid per spec app. F) — decodes it through
    functions/gif.py and emits per-channel pixel sums that SQL recomputes
    from the same formulas.  Palette lookup, 4-pass de-interlace,
    transparent-index alpha and the LSB-first variable-width bit unpacking
    must all be exact for the sums to match.  Lossless end-to-end."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        import struct as _struct

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 10 == 9]
        n = len(ids)
        sums = np.empty((n, 4), np.int64)
        w, h = 13, 7
        xg, yg = np.meshgrid(np.arange(w), np.arange(h))
        i8 = np.arange(8)
        ilrows = np.concatenate(
            [np.arange(s, h, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))])
        lsb4 = np.arange(4)[None, :]
        for i in range(n):
            d = int(ids[i])
            idx = ((2 * xg + 3 * yg + d) % 8).astype(np.uint8)
            pal = np.stack([(5 * d + 23 * i8) % 256, (7 * d + 41 * i8) % 256,
                            (11 * d + 53 * i8) % 256], axis=1).astype(np.uint8)
            stream = idx[ilrows].reshape(-1)
            codes = np.empty(2 * len(stream) + 1, np.int64)
            codes[0] = 8
            codes[1::2] = stream
            codes[2::2] = 8
            codes[-1] = 9
            bits = ((codes[:, None] >> lsb4) & 1).astype(np.uint8).reshape(-1)
            pad = (-len(bits)) % 8
            data = np.packbits(np.concatenate(
                [bits, np.zeros(pad, np.uint8)]).reshape(-1, 8)[:, ::-1],
                axis=1).tobytes()
            sub = b""
            for k in range(0, len(data), 255):
                c = data[k : k + 255]
                sub += bytes([len(c)]) + c
            sub += b"\x00"
            buf = (b"GIF89a" + _struct.pack("<HHBBB", w, h, 0x80 | 2, 0, 0)
                   + pal.tobytes()
                   + b"\x21\xf9\x04" + bytes([0x01, 0, 0, 5]) + b"\x00"
                   + b"\x2c" + _struct.pack("<HHHHB", 0, 0, w, h, 0x40)
                   + bytes([3]) + sub + b"\x3b")
            out = giffns.decode_gif(buf)
            if out.shape != (h, w, 4):
                raise ValueError(f"foreign GIF decoded to {out.shape} (doc {d})")
            sums[i] = out.astype(np.int64).sum(axis=(0, 1))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "r_sum": pa.array(sums[:, 0], pa.int64()),
            "g_sum": pa.array(sums[:, 1], pa.int64()),
            "b_sum": pa.array(sums[:, 2], pa.int64()),
            "a_sum": pa.array(sums[:, 3], pa.int64()),
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    if out.shape[1] == 0:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "r_sum": pd.Series(dtype=np.int64), "g_sum": pd.Series(dtype=np.int64),
            "b_sum": pd.Series(dtype=np.int64), "a_sum": pd.Series(dtype=np.int64),
        })
    return out.sort_values("doc_id").reset_index(drop=True)


_BMP_SQL = """
WITH cell AS (
  SELECT d.doc_id, y.y, (((x.x // 4) * 3 + 5*y.y + d.doc_id) % 16) AS idx
  FROM documents d, generate_series(0,13) x(x), generate_series(0,5) y(y)
  WHERE d.doc_id % 10 = 3)
SELECT doc_id,
  SUM((5*doc_id + 17*idx) % 256)::BIGINT AS r_sum,
  SUM((7*doc_id + 19*idx) % 256)::BIGINT AS g_sum,
  SUM((11*doc_id + 23*idx) % 256)::BIGINT AS b_sum,
  SUM((y+1) * (((5*doc_id + 17*idx) % 256) + ((7*doc_id + 19*idx) % 256)
             + ((11*doc_id + 23*idx) % 256)))::BIGINT AS wy_sum
FROM cell GROUP BY doc_id ORDER BY doc_id
"""


@register("bmp_foreign_decode_invariant", _BMP_SQL)
def bmp_foreign_decode_invariant(sf_dir: str):
    """BMP ingest in the driver loop: per doc (1-in-10 slice) the stage
    hand-assembles an 8-bit paletted BI_RLE8 bottom-up BMP from doc_id
    formulas — even storage rows use encoded runs (the x//4 block pattern
    gives genuine run lengths 4/4/4/2), odd rows a single word-aligned
    absolute block — decodes it through functions/bmp.py and emits
    per-channel pixel sums plus a row-weighted sum that SQL recomputes
    from the same formulas.  Palette lookup, RLE escape handling and the
    bottom-up row flip must all be exact (wy_sum catches a y-flip that
    plain channel sums cannot).  Lossless end-to-end."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    w, h = 14, 6

    def fn(batch: pa.Table) -> pa.Table:
        import struct as _struct

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 10 == 3]
        n = len(ids)
        out = np.empty((n, 4), np.int64)
        i16 = np.arange(16)
        xg = np.arange(w)[None, :] // 4
        yg = np.arange(h)[:, None]
        for i in range(n):
            d = int(ids[i])
            idx = ((xg * 3 + 5 * yg + d) % 16).astype(np.uint8)
            pal = np.stack([(5 * d + 17 * i16) % 256, (7 * d + 19 * i16) % 256,
                            (11 * d + 23 * i16) % 256], axis=1).astype(np.uint8)
            quads = np.zeros((16, 4), np.uint8)
            quads[:, :3] = pal[:, ::-1]
            rle = bytearray()
            for y in range(h - 1, -1, -1):  # bottom-up storage order
                if y % 2 == 0:
                    for x0 in range(0, w, 4):
                        run = min(4, w - x0)
                        rle += bytes((run, int(idx[y, x0])))
                else:
                    row = idx[y].tobytes()
                    rle += bytes((0, w)) + row + (b"\x00" if w % 2 else b"")
                rle += b"\x00\x00"  # end of line
            rle += b"\x00\x01"  # end of bitmap
            off = 14 + 40 + 64
            info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1,
                                len(rle), 0, 0, 16, 0)
            buf = (_struct.pack("<2sIHHI", b"BM", off + len(rle), 0, 0, off)
                   + info + quads.tobytes() + bytes(rle))
            px = bmpfns.decode_bmp(buf)
            if px.shape != (h, w, 3):
                raise ValueError(f"foreign BMP decoded to {px.shape} (doc {d})")
            p64 = px.astype(np.int64)
            out[i, :3] = p64.sum(axis=(0, 1))
            out[i, 3] = (p64.sum(axis=(1, 2)) * (np.arange(h) + 1)).sum()
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "r_sum": pa.array(out[:, 0], pa.int64()),
            "g_sum": pa.array(out[:, 1], pa.int64()),
            "b_sum": pa.array(out[:, 2], pa.int64()),
            "wy_sum": pa.array(out[:, 3], pa.int64()),
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    if out.shape[1] == 0:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "r_sum": pd.Series(dtype=np.int64), "g_sum": pd.Series(dtype=np.int64),
            "b_sum": pd.Series(dtype=np.int64), "wy_sum": pd.Series(dtype=np.int64),
        })
    return out.sort_values("doc_id").reset_index(drop=True)
