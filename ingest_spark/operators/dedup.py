"""Deduplication suite for web-scale corpora (documents table).

Five dedup families, each a first-class operator with a declarative
Spark plan; Python only in the sketch kernels (Arrow-batched):

1. exact        — md5 hash groupBy (portable oracle: DuckDB md5)
2. minhash-LSH  — shingle → k-perm MinHash → banded bucket join
3. simhash      — 64-bit Charikar fingerprint + banded hamming join
4. ngram-jaccard— exact set Jaccard via shingle explode + self-join
5. embedding    — cosine near-dup via hyperplane LSH buckets

Scale notes: every pairwise family is bucketed (LSH bands / hash
prefixes) so the self-join is per-bucket, never a global cross join;
bucket skew is bounded because signatures are uniform hashes. The
canonical-survivor rule is always min(doc_id) — deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import DEFAULT, EngineConfig
from ..functions import sketches as sk


# ------------------------------------------------------------- exact

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id) for every doc whose text is byte-equal to
    an earlier doc. Plan: md5 → groupBy hash → min(id) broadcast back."""
    h = docs.select(F.col(id_col), F.md5(F.encode(text_col, "UTF-8")).alias("h"))
    canon = h.groupBy("h").agg(F.min(id_col).alias("canonical_id"))
    return (
        h.join(canon, "h")
        .where(F.col(id_col) != F.col("canonical_id"))
        .select(F.col(id_col), "canonical_id")
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (the min-id canonical)."""
    w_min = (
        docs.groupBy(F.md5(F.encode(text_col, "UTF-8")).alias("h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(w_min, id_col, "left_semi")


# ---------------------------------------------------------- minhash

def _minhash_udf(k: int, shingle: int):
    @F.pandas_udf(ArrayType(LongType()))
    def _u(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sig = sk.minhash_signature(sk.char_shingles(t or "", shingle), k)
            out.append(sig.view(np.int64).tolist())
        return pd.Series(out)
    return _u


def _bands_udf(bands: int):
    @F.pandas_udf(ArrayType(LongType()))
    def _u(sig: pd.Series) -> pd.Series:
        out = []
        for s in sig:
            bs = sk.minhash_bands(np.asarray(s, dtype=np.int64).view(np.uint64), bands)
            out.append(bs.view(np.int64).tolist())
        return pd.Series(out)
    return _u


def with_minhash(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    return docs.select(
        F.col(id_col),
        _minhash_udf(cfg.minhash_perms, cfg.shingle_size)(F.col(text_col)).alias("minhash"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs sharing ≥1 LSH band, scored by signature-equality
    Jaccard estimate, filtered at ``threshold``. Returns
    (doc_a, doc_b, est_jaccard) with doc_a < doc_b."""
    sigs = with_minhash(docs, cfg, id_col, text_col)
    banded = sigs.select(
        F.col(id_col).alias("doc"),
        "minhash",
        F.posexplode(_bands_udf(cfg.minhash_bands)("minhash")).alias("band_idx", "band_hash"),
    )
    a = banded.select(
        F.col("doc").alias("doc_a"), F.col("minhash").alias("sig_a"), "band_idx", "band_hash"
    )
    b = banded.select(
        F.col("doc").alias("doc_b"), F.col("minhash").alias("sig_b"), "band_idx", "band_hash"
    )
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # count of equal signature positions / k = Jaccard estimate
    eq_count = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.withColumn("est_jaccard", eq_count / F.lit(cfg.minhash_perms))
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def dedup_minhash(
    docs: DataFrame,
    threshold: float = 0.8,
    cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop near-duplicates: any doc paired (est_jaccard ≥ t) with a
    lower-id doc is removed. (Union-find-free approximation: one
    hop — sufficient when duplicates form tight clusters.)"""
    pairs = minhash_lsh_pairs(docs, threshold, cfg, id_col, text_col)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


# ---------------------------------------------------------- simhash

def _simhash_udf():
    @F.pandas_udf(LongType())
    def _u(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.uint64)
        for i, t in enumerate(text):
            toks = (t or "").lower().split()
            th = np.array([sk.hash_str(w) for w in toks], dtype=np.uint64)
            out[i] = sk.simhash(th)
        return pd.Series(out.view(np.int64))
    return _u


def with_simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), _simhash_udf()(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ d via the pigeonhole
    block trick: split 64 bits into d+1 blocks; equal pair ⇒ at least
    one block identical ⇒ candidate join per block, exact hamming
    re-check after."""
    sh = with_simhash(docs, id_col, text_col)
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("block_idx"),
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            ).alias("block_val"),
        )
        for i in range(nblocks)
    ])
    exploded = sh.select(F.col(id_col).alias("doc"), "simhash", F.explode(blocks).alias("b")) \
        .select("doc", "simhash", F.col("b.block_idx").alias("block_idx"), F.col("b.block_val").alias("block_val"))
    a = exploded.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"), "block_idx", "block_val")
    b = exploded.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"), "block_idx", "block_val")
    cand = (
        a.join(b, ["block_idx", "block_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ----------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT word-n-gram Jaccard similarity pairs ≥ threshold.

    Declarative plan (fully SQL-expressible → DuckDB oracle twin):
    normalize → word array → n-gram strings → explode distinct →
    self-join on gram → |A∩B| per pair → Jaccard via inclusion-
    exclusion with per-doc gram counts.
    """
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")), " "
    )
    grams = F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(-1))),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
            lambda g: g != "",
        )
    )
    g = docs.select(F.col(id_col).alias("doc"), F.explode(grams).alias("gram"))
    sizes = g.groupBy("doc").agg(F.count("*").alias("n_grams"))

    a = g.select(F.col("doc").alias("doc_a"), "gram")
    b = g.select(F.col("doc").alias("doc_b"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------------- embedding cosine

def _bucket_udf(n_planes: int):
    @F.pandas_udf(LongType())
    def _u(vec: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
        return pd.Series(sk.hyperplane_buckets(mat, n_planes))
    return _u


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold.

    Scale path (default): hyperplane-LSH bucket join — only vectors in
    the same sign-bucket are compared (recall < 1 but tunable via
    n_planes; multi-probe = lower n_planes).
    ``exact=True``: full self-join (the oracle twin, O(n²) — small n
    or verification only).
    """
    cos = _cosine_expr("va", "vb")
    if exact:
        a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        withb = embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
            _bucket_udf(n_planes)(F.col(vec_col)).alias("bucket"),
        )
        a = withb.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
        b = withb.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
        pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _cosine_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)
