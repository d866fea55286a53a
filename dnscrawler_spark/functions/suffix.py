"""Public-suffix extraction (SURVEY §2.7 F5/F6) over a real PSL snapshot.

The reference calls ``tldextract.extract`` for (domain, suffix) facts
(/root/reference/dnscrawler/dnsresolver_new.py:96-97,187). tldextract is
not installed here, so the engine embeds a snapshot of the public-domain
Mozilla Public Suffix List (``data/public_suffix_list.dat.gz``, 9.5k
rules) and implements the published PSL algorithm itself: exception
rules beat everything, else longest match among normal + wildcard
rules, else the default rule ``*`` (last label). One extra rule —
``img.ps`` — is appended for the synthetic fixture topology (the
``ps_`` fact-prefix trigger, dnsresolver_new.py:203-204).

Three agreement-tested implementations:

- ``extract(host)``: scalar Python — the oracle's path, shared with the
  engine's UDF so crawl parity is by construction.
- ``suffix_struct_col(host)``: vectorized Arrow/pandas UDF returning
  STRUCT<tld, sld> — the engine hot path. The rule set rides the UDF
  closure (~0.5 MB per executor, the classic broadcast-dictionary
  pattern tldextract itself uses); zero shuffle, stays in the stage.
- ``suffix_facts_for_hosts(hosts_df)``: pure-Catalyst alternative —
  candidate-suffix explode + broadcast join against the rules table +
  hash-agg longest-match. Zero Python, two narrow shuffles; the right
  shape when a deployment bans Python workers entirely.

``tld`` = matched public suffix; ``sld`` = registered domain
(one label + suffix) — mirroring the reference's sld/tld fact pair
(dnsresolver_new.py:101-123).
"""

from __future__ import annotations

import gzip
from functools import lru_cache
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

def _psl_bytes() -> bytes:
    """The embedded PSL snapshot, via importlib.resources so it loads
    identically from a source checkout AND from a spark-submit
    --py-files zip (zipimport has no real __file__ paths)."""
    from importlib import resources

    return (
        resources.files("dnscrawler_spark")
        .joinpath("data/public_suffix_list.dat.gz")
        .read_bytes()
    )

# fixture-topology extra rules (synthetic web uses img.ps as its
# public-suffix-tree apex; the real PSL carries ps but not img.ps)
EXTRA_RULES = ("img.ps",)
PS_FACT_SUFFIX = "img.ps"  # hosts under this suffix yield ps_-prefixed facts

# deepest rule in the snapshot is 5 labels; +1 headroom for extras
MAX_RULE_LABELS = 6


@lru_cache(maxsize=1)
def _load_rules() -> tuple[frozenset[str], frozenset[str], frozenset[str]]:
    """(normal, wildcard-bases, exceptions) from the embedded snapshot.

    ``*.foo.bar`` is stored as base ``foo.bar`` in the wildcard set;
    ``!www.ck`` as ``www.ck`` in the exception set. ICANN + private
    sections are both kept (tldextract's default)."""
    import io

    normal, wild, exc = set(EXTRA_RULES), set(), set()
    with gzip.open(io.BytesIO(_psl_bytes()), "rt", encoding="utf-8") as fh:
        for line in fh:
            rule = line.strip().lower()
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("!"):
                exc.add(rule[1:])
            elif rule.startswith("*."):
                wild.add(rule[2:])
            else:
                normal.add(rule)
    return frozenset(normal), frozenset(wild), frozenset(exc)


def split_labels(name: str) -> list[str]:
    """Label split with empty-part removal (dnsresolver_new.py:186)."""
    return [p for p in name.split(".") if p]


def _suffix_label_count(labels: list[str]) -> int:
    """PSL match: number of labels in the public suffix of ``labels``."""
    normal, wild, exc = _load_rules()
    n = len(labels)
    best = 1  # the default rule '*'
    lo = max(0, n - MAX_RULE_LABELS)
    for i in range(lo, n):
        cand = ".".join(labels[i:])
        if cand in exc:
            # exception rule: suffix = rule minus its leftmost label
            return n - i - 1
        ln = n - i
        if ln > best and cand in normal:
            best = ln
        # '*.base' matches labels[i:] when labels[i+1:] == base (needs
        # the extra leftmost label to exist)
        if ln > best and i + 1 < n and ".".join(labels[i + 1 :]) in wild:
            best = ln
    return best


def extract(host: str) -> tuple[str, str]:
    """(tld, sld) of a hostname per the PSL algorithm. sld='' when the
    host IS a bare suffix or has no label above the suffix."""
    labels = split_labels(host.lower())
    if not labels:
        return "", ""
    m = _suffix_label_count(labels)
    tld = ".".join(labels[-m:])
    sld = ".".join(labels[-(m + 1) :]) if len(labels) > m else ""
    return tld, sld


def is_ps_host(host: str) -> bool:
    return host == PS_FACT_SUFFIX or host.endswith("." + PS_FACT_SUFFIX)


# ---------------------------------------------------------------- engine path


_SFX_TYPE = T.StructType(
    [T.StructField("tld", T.StringType()), T.StructField("sld", T.StringType())]
)


@pandas_udf(_SFX_TYPE)
def suffix_struct_col(host: pd.Series) -> pd.DataFrame:
    """Vectorized (tld, sld) — Arrow-batched, rule set per-executor."""
    out = [extract(h) if h else ("", "") for h in host]
    return pd.DataFrame(out, columns=["tld", "sld"])


def tld_col(host: Column) -> Column:
    return suffix_struct_col(host)["tld"]


def sld_col(host: Column) -> Column:
    return suffix_struct_col(host)["sld"]


def is_ps_host_col(host: Column) -> Column:
    return (host == PS_FACT_SUFFIX) | host.endswith("." + PS_FACT_SUFFIX)


# ------------------------------------------------------- pure-Catalyst path


_RULES_DF_CACHE: dict[int, DataFrame] = {}


def suffix_rules_df(spark) -> DataFrame:
    """The rules table for the broadcast-join path: one row per rule with
    its match key (the literal suffix a host candidate must equal) and
    the resulting suffix label count. Wildcards contribute their base
    with wild=true (match at base_len+1); exceptions carry rank 0 so a
    min() beats every normal match.

    Memoized per session as a parquet-backed frame: a raw
    ``createDataFrame`` embeds a 9.5k-row LocalRelation into EVERY
    consumer's logical plan (the crawl's facts union references this
    once per glue-resolved branch per round — megabytes of plan and a
    rebuilt broadcast each time, measured as the dominant cost of the
    two-wave facts write); a one-time parquet round-trip turns every
    reference into a small file scan."""
    key = id(spark)
    if key in _RULES_DF_CACHE:
        return _RULES_DF_CACHE[key]
    import tempfile

    normal, wild, exc = _load_rules()
    rows = (
        [(r, len(r.split(".")), 1) for r in normal]
        + [(r, len(r.split(".")) + 1, 2) for r in wild]  # matched via parent-of-candidate
        + [(r, len(r.split(".")) - 1, 0) for r in exc]
    )
    path = tempfile.mkdtemp(prefix="psl_rules_")
    spark.createDataFrame(
        rows, "rule string, suffix_len int, rank int"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.schema("rule string, suffix_len int, rank int").parquet(path)
    _RULES_DF_CACHE[key] = df
    return df


def suffix_facts_for_hosts(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """Pure-Catalyst (host → tld, sld) mapping: explode each host's
    candidate suffixes (last 1..MAX_RULE_LABELS labels, plus the
    wildcard parent form), broadcast-join the 9.5k-row rules table,
    hash-agg the winning rule (exception rank < normal < wildcard-tie;
    within rank, longest suffix). Input should be distinct hosts (a
    dimension, not the event stream); output joins back broadcast."""
    spark = hosts.sparkSession
    labels = F.filter(F.split(F.lower(F.col(host_col)), r"\."), lambda x: F.length(x) > 0)
    h = hosts.select(F.col(host_col).alias("host")).distinct().withColumn("labels", labels)
    # candidates: ".".join(labels[-k:]) for k=1..MAX; wildcard form drops
    # the leftmost candidate label (rule base) and is matched via rank=2
    cand = h.select(
        "host",
        "labels",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(F.size("labels"), F.lit(MAX_RULE_LABELS))),
                lambda k: F.struct(
                    F.array_join(F.slice(F.col("labels"), -k, k), ".").alias("cand"),
                    k.alias("k"),
                ),
            )
        ).alias("c"),
    ).select(
        "host",
        F.size("labels").alias("n_labels"),
        F.col("c.cand").alias("cand"),
        F.col("c.k").alias("k"),
    )
    rules = F.broadcast(suffix_rules_df(spark))
    # normal/exception match: cand == rule (k == rule labels, implied);
    # wildcard match: candidate's PARENT equals the base → join on the
    # candidate string minus its first label, encoded by rank=2 rows
    # keyed at suffix_len = base+1 == k. We join rank<2 on cand, rank=2
    # on the parent string.
    parent = F.regexp_replace(F.col("cand"), r"^[^.]+\.", "")
    matches = (
        cand.withColumn("parent", F.when(F.col("k") >= 2, parent))
        .join(
            rules,
            (
                ((rules["rank"] < 2) & (rules["rule"] == F.col("cand")))
                | (
                    (rules["rank"] == 2)
                    & (F.col("parent").isNotNull())
                    & (rules["rule"] == F.col("parent"))
                    & (rules["suffix_len"] == F.col("k"))
                )
            ),
            "left",
        )
        .groupBy("host", "n_labels")
        .agg(
            F.min(
                F.when(
                    F.col("rank").isNotNull(),
                    F.struct(F.col("rank"), (-F.col("suffix_len")).alias("neg_len")),
                )
            ).alias("best")
        )
        .select(
            "host",
            "n_labels",
            F.coalesce(-F.col("best.neg_len"), F.lit(1)).alias("m"),
        )
    )
    labels2 = F.filter(F.split(F.lower(F.col("host")), r"\."), lambda x: F.length(x) > 0)
    return matches.withColumn("labels", labels2).select(
        "host",
        F.array_join(F.slice(F.col("labels"), -F.col("m"), F.col("m")), ".").alias("tld"),
        F.when(
            F.col("n_labels") > F.col("m"),
            F.array_join(
                F.slice(F.col("labels"), -(F.col("m") + 1), F.col("m") + 1), "."
            ),
        )
        .otherwise(F.lit(""))
        .alias("sld"),
    )
