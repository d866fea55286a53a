"""Brute-force pure-Python twins for the probes whose hash functions
have no DuckDB builtin (VERDICT r4 #1: the 5 ``no_oracle`` rows).

Each function reads the same parquet inputs the Spark probe reads (via
duckdb — no Spark involved), recomputes the result with an independent
scalar implementation (pyxxhash + plain loops instead of Catalyst
expressions), and returns a pandas DataFrame the probe dumps next to
the crawl-probe oracles in ``/tmp/dnscrawler_spark_probe`` — the
driver's DuckDB ``read_parquet`` twin then hash-compares both sides,
upgrading these probes from rows-only to fully verified.

Independence boundary: input GENERATION is shared (the probes read the
driver's parquet / datagen's deterministic corpus — same inputs by
definition); every COMPUTED step (normalization, token hashing, sign
votes, hyperplane weights, cosine ranking, codec laws) is re-derived
here scalar-by-scalar, none of it imported from the operators package.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from dnscrawler_spark.oracle.pyxxhash import Long, spark_xxhash64

_MASK = (1 << 64) - 1
# Java regex \s (Spark's regexp_replace) — NOT Python's unicode \s
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def spark_round(x: float, scale: int = 6) -> float:
    """Twin of Spark's ``round(double, s)``: shortest-repr decimal,
    HALF_UP — matches ``BigDecimal.valueOf(x).setScale(s, HALF_UP)``."""
    if x != x or math.isinf(x):
        return x
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _norm_text(text: str) -> str:
    """Twin of operators.dedup.normalize_text: lower(trim(text)) then
    collapse Java-\\s runs to one space. Spark's ``trim`` strips only
    0x20 space characters."""
    return _JAVA_WS.sub(" ", text.strip(" ").lower())


def _read(sf_dir: str, table: str, cols: str):
    import duckdb

    return duckdb.sql(
        f"SELECT {cols} FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchall()


# ---------------------------------------------------------------- F12


def f12_xxhash_keys(sf_dir: str) -> pd.DataFrame:
    """Twin of ``xxhash64(text)`` URL keying over documents."""
    rows = _read(sf_dir, "documents", "doc_id, text")
    return pd.DataFrame(
        {
            "doc_id": [int(d) for d, _ in rows],
            "url_key": [spark_xxhash64(t) for _, t in rows],
        }
    ).astype({"doc_id": "int64", "url_key": "int64"})


# ------------------------------------------------------------- SimHash


def _simhash64(text: str) -> int:
    """UNSIGNED 64-bit SimHash: per-token xxhash64 sign votes. Token
    stream matches ``F.split(norm, " ")`` + explode (duplicates kept;
    empty text yields the single token '')."""
    votes = [0] * 64
    for tok in _norm_text(text).split(" "):
        u = spark_xxhash64(tok) & _MASK
        for i in range(64):
            votes[i] += 1 if (u >> i) & 1 else -1
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 8) -> pd.DataFrame:
    """Twin of dedup.simhash_near_pairs: candidate pairs share at least
    one exact 16-bit chunk (the pigeonhole block join's reachable set),
    then hamming ≤ max_hamming."""
    rows = _read(sf_dir, "documents", "doc_id, text")
    sigs = [(int(d), _simhash64(t)) for d, t in rows]
    sigs.sort()
    out_a, out_b, out_h = [], [], []
    for i in range(len(sigs)):
        da, ua = sigs[i]
        ca = [(ua >> (16 * k)) & 0xFFFF for k in range(4)]
        for j in range(i + 1, len(sigs)):
            db, ub = sigs[j]
            if not any(ca[k] == ((ub >> (16 * k)) & 0xFFFF) for k in range(4)):
                continue
            ham = bin(ua ^ ub).count("1")
            if ham <= max_hamming:
                out_a.append(min(da, db))
                out_b.append(max(da, db))
                out_h.append(ham)
    return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h}).astype(
        {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
    )


# ------------------------------------------------------------ LSH ANN


def _dot(a, b) -> float:
    """Sequential left fold — the exact summation order of
    ``F.aggregate(zip_with(a, b, *), 0.0, acc + x)``."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cosine(a, b) -> float:
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def _hyperplane_sketch(vec, n_planes: int) -> int:
    """Twin of similarity.hyperplane_sketch: bit p set iff
    Σ_d vec[d] · (xxhash64(p, d, 'hyperplane') as double / 2^63) > 0."""
    out = 0
    for p in range(n_planes):
        acc = 0.0
        for d, x in enumerate(vec):
            w = float(spark_xxhash64(p, d, "hyperplane")) / float(2**63)
            acc += x * w
        if acc > 0:
            out |= 1 << p
    return out


def sim_lsh_topk(
    sf_dir: str, k: int = 10, n_planes: int = 12, n_queries: int = 4
) -> pd.DataFrame:
    """Twin of similarity.lsh_topk over embeddings with queries
    vec_id < n_queries: multi-probe buckets (exact + all 1-bit flips),
    exact cosine re-rank, per-query top-k by (score desc, vec_id)."""
    rows = _read(sf_dir, "embeddings", "vec_id, embedding")
    # float32 → double widening is exact (matches the cast in the probe)
    corpus = [(int(v), [float(x) for x in emb]) for v, emb in rows]
    sketches = {v: _hyperplane_sketch(emb, n_planes) for v, emb in corpus}
    out = []
    for qid, qv in corpus:
        if qid >= n_queries:
            continue
        probes = {sketches[qid]} | {
            sketches[qid] ^ (1 << p) for p in range(n_planes)
        }
        scored = [
            (spark_round(_cosine(cv, qv), 6), cid)
            for cid, cv in corpus
            if cid != qid and sketches[cid] in probes
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rn, (score, cid) in enumerate(scored[:k], start=1):
            out.append((qid, cid, score, rn))
    return pd.DataFrame(
        out, columns=["query_id", "vec_id", "score", "rn"]
    ).astype({"query_id": "int64", "vec_id": "int64", "score": "float64", "rn": "int64"})


def sim_ivf_topk(
    sf_dir: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_queries: int = 4,
) -> pd.DataFrame:
    """Twin of similarity.ivf_topk over embeddings with queries
    vec_id < n_queries: centroids = the n_centroids corpus vectors with
    the smallest xxhash64(vec_id, 'ivf-train') (ties by vec_id; cluster
    id = rank), every corpus vector assigned to its argmax-cosine
    centroid (ties -> larger cluster id, the struct-max rule), each
    query exactly re-ranking its n_probe nearest centroid lists
    (score desc, cid desc), per-query top-k by (score desc, vec_id)."""
    rows = _read(sf_dir, "embeddings", "vec_id, embedding")
    corpus = [(int(v), [float(x) for x in emb]) for v, emb in rows]
    # vec_id is a BIGINT column -> 8-byte hash (Long marker)
    by_hash = sorted(
        corpus, key=lambda t: (spark_xxhash64(Long(t[0]), "ivf-train"), t[0])
    )
    cents = [v for _, v in by_hash[:n_centroids]]

    def centroid_scores(vec):
        return [(_cosine(vec, cv), ci) for ci, cv in enumerate(cents)]

    assign = {vid: max(centroid_scores(v))[1] for vid, v in corpus}
    out = []
    for qid, qv in corpus:
        if qid >= n_queries:
            continue
        probes = {
            ci
            for _, ci in sorted(
                centroid_scores(qv), key=lambda t: (-t[0], -t[1])
            )[:n_probe]
        }
        scored = [
            (spark_round(_cosine(cv, qv), 6), cid)
            for cid, cv in corpus
            if cid != qid and assign[cid] in probes
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rn, (score, cid) in enumerate(scored[:k], start=1):
            out.append((qid, cid, score, rn))
    return pd.DataFrame(
        out, columns=["query_id", "vec_id", "score", "rn"]
    ).astype({"query_id": "int64", "vec_id": "int64", "score": "float64", "rn": "int64"})


# --------------------------------------------------------- multimodal

QSTEP = 4  # re-stated codec law (codecs.py qjpg quantization)


def _mm_rows(n_pages: int, seed: int, stub_mod: int = 10, stub_residues=(3, 8)):
    """Per-image (i, fmt, pixels-after-decode) for the mm probes.

    Input generation (page_pixels + the fmt mix) is shared with datagen
    by definition; the DECODE law is re-derived: lossless formats return
    the source pixels, qjpg returns the quantization midpoints, and
    every stub-relabeled row (external format) fails to decode.
    """
    from dnscrawler_spark import datagen

    for i in range(n_pages):
        m = datagen.mix2(i, seed ^ datagen._S_IMG ^ 0xF0)
        fmt = ("raw", "png", "qjpg")[m % 3]
        if i % stub_mod in stub_residues:
            yield i, "jpeg", None
            continue
        pixels, _w, _h = datagen.page_pixels(i, seed)
        if fmt == "qjpg":
            pixels = (
                (pixels.astype("uint16") // QSTEP * QSTEP + QSTEP // 2)
                .clip(0, 255)
                .astype("uint8")
            )
        yield i, fmt, pixels


def mm_decode_features(n_pages: int = 96, seed: int = 7) -> pd.DataFrame:
    recs = []
    for i, fmt, arr in _mm_rows(n_pages, seed):
        iid = f"img-{i:012d}"
        if arr is None:
            recs.append((iid, fmt, None, None, None, None, False))
        else:
            h, w, c = arr.shape
            recs.append(
                (iid, fmt, w, h, c, spark_round(float(arr.mean()), 6), True)
            )
    pdf = pd.DataFrame(
        recs,
        columns=["image_id", "fmt", "dec_w", "dec_h", "channels", "mean_luma", "decode_ok"],
    )
    for col in ("dec_w", "dec_h", "channels"):
        pdf[col] = pdf[col].astype("Int32")
    return pdf


def mm_frame_sample(n_pages: int = 96, seed: int = 7, every: int = 4) -> pd.DataFrame:
    ids, idxs, lumas = [], [], []
    for i, _fmt, arr in _mm_rows(n_pages, seed):
        if arr is None:
            continue  # stub formats never decode — no frames
        for fi in range(0, arr.shape[0], every):
            ids.append(f"img-{i:012d}")
            idxs.append(fi)
            lumas.append(spark_round(float(arr[fi].mean()), 6))
    return pd.DataFrame(
        {"image_id": ids, "frame_idx": idxs, "row_luma": lumas}
    ).astype({"frame_idx": "int64", "row_luma": "float64"})


def _phash_corpus(n: int) -> list:
    """Scalar rebuild of __spark_entry__._phash_probe_images: per image
    the xxhash64 group base with the first ``variant`` of 3 group-keyed
    bit positions flipped, in unsigned space."""
    phs = []
    for i in range(n):
        grp, var = i // 4, i % 4
        u = spark_xxhash64(Long(grp)) & _MASK
        for k in range(var):
            # pmod(xxhash64(grp*8 + (k+100)), 64): Python % on the
            # signed hash is exactly Spark's pmod (non-negative result)
            pos = spark_xxhash64(Long(grp * 8 + k + 100)) % 64
            u ^= 1 << pos
        phs.append((f"img-{i:012d}", u))
    return phs


def mm_phash_near_dup(n: int = 256, max_hamming: int = 3) -> pd.DataFrame:
    """Twin of ``dedup.phash_near_dup`` over the probe's planted-cluster
    corpus (__spark_entry__._phash_probe_images): rebuild each phash
    scalar-by-scalar (pyxxhash base + explicit bit flips in unsigned
    space), then a brute-force ALL-PAIRS popcount — no pigeonhole, so a
    blocking bug that dropped a pair would hash-mismatch the gate."""
    phs = _phash_corpus(n)
    rows = []
    for a in range(n):
        for b in range(a + 1, n):
            ham = bin(phs[a][1] ^ phs[b][1]).count("1")
            if ham <= max_hamming:
                rows.append((phs[a][0], phs[b][0], ham))
    pdf = pd.DataFrame(rows, columns=["img_a", "img_b", "hamming"])
    pdf["hamming"] = pdf["hamming"].astype("int32")
    return pdf


def dedup_phash_groups(n: int = 257, max_hamming: int = 3) -> pd.DataFrame:
    """Twin of the ``dedup_phash_groups`` probe (pairs → connected
    components → survivor election), derived with completely different
    machinery: brute-force all-pairs popcount + pure-Python union-find
    instead of pigeonhole blocking + alternating-star DataFrame
    iteration. Survivor = max variant, ties → min image_id."""
    phs = _phash_corpus(n)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(n):
        for b in range(a + 1, n):
            if bin(phs[a][1] ^ phs[b][1]).count("1") <= max_hamming:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
    members: dict = {}
    for i in range(n):
        members.setdefault(find(i), []).append(i)
    rows = []
    for ms in members.values():
        comp = phs[min(ms)][0]
        # max variant (i % 4), ties broken by min image_id == min index
        keeper = min(ms, key=lambda i: (-(i % 4), phs[i][0]))
        for i in ms:
            rows.append((phs[i][0], comp, i == keeper))
    pdf = pd.DataFrame(rows, columns=["image_id", "component", "keep"])
    pdf["keep"] = pdf["keep"].astype("bool")
    return pdf.sort_values("image_id").reset_index(drop=True)


def _union_find_groups(ids: list, pairs: list, id_name: str) -> pd.DataFrame:
    """(id, component, keep) via pure-Python union-find over ``pairs``;
    component = min member id, survivor = the component id itself."""
    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    members: dict = {}
    for d in ids:
        members.setdefault(find(d), []).append(d)
    rows = []
    for ms in members.values():
        comp = min(ms)
        for d in ms:
            rows.append((d, comp, d == comp))
    pdf = pd.DataFrame(rows, columns=[id_name, "component", "keep"])
    pdf["keep"] = pdf["keep"].astype("bool")
    return pdf.sort_values(id_name).reset_index(drop=True)


def dedup_minhash_groups(sf_dir: str, pairs_sql: str) -> pd.DataFrame:
    """Twin of the ``dedup_minhash_groups`` probe: duplicate clusters +
    survivor election over the documents table's MinHash-LSH pair
    graph. The pair list comes from the ALREADY-AUDITED DuckDB SQL twin
    of ``dedup_minhash_lsh`` (passed in verbatim — md5 signatures,
    banding, bucket join, hash-green since r3); the cluster/survivor
    stage is re-derived here with pure-Python union-find instead of the
    engine's alternating-star iteration. Survivor = min doc_id."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    pairs = con.execute(pairs_sql).fetchdf()
    ids = [r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()]
    con.close()
    return _union_find_groups(ids, list(zip(pairs["doc_a"], pairs["doc_b"])), "doc_id")


def dedup_embedding_groups(sf_dir: str, pairs_sql: str) -> pd.DataFrame:
    """Twin of the ``dedup_embedding_groups`` probe: same machinery as
    ``dedup_minhash_groups`` but over the embeddings table's
    cosine-threshold pair graph (the audited ``dedup_embedding_cosine``
    SQL twin, vec_id < 300). Survivor = min vec_id."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    pairs = con.execute(pairs_sql).fetchdf()
    ids = [
        r[0]
        for r in con.execute("SELECT vec_id FROM embeddings WHERE vec_id < 300").fetchall()
    ]
    con.close()
    return _union_find_groups(ids, list(zip(pairs["id_a"], pairs["id_b"])), "vec_id")
