"""Public-suffix extraction (SURVEY §2.7 F5/F6) without tldextract.

The reference calls ``tldextract.extract`` for (domain, suffix) facts
(/root/reference/dnscrawler/dnsresolver_new.py:96-97,187). No network
and no tldextract here, so the engine carries a small built-in suffix
table with longest-match semantics — scalar Python for the oracle and a
pure Catalyst when-chain for the engine (the table is tiny, so the
expression stays codegen-able; a full PSL would move to a broadcast
map-join instead).

``tld`` = matched public suffix; ``sld`` = registered domain
(one label + suffix) — mirroring the reference's sld/tld fact pair
(dnsresolver_new.py:101-123).

The ``ps_`` fact-prefix trigger (dnsresolver_new.py:203-204 — facts
learned while resolving a public-suffix dependency): hosts under
``PS_FACT_SUFFIX`` take ``ps_``-prefixed facts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# multi-label suffixes first (longest match wins)
TWO_LABEL_SUFFIXES = ("co.uk", "img.ps")
ONE_LABEL_SUFFIXES = ("com", "net", "org", "uk", "ps")
PS_FACT_SUFFIX = "img.ps"  # hosts under this suffix yield ps_-prefixed facts


def split_labels(name: str) -> list[str]:
    """Label split with empty-part removal (dnsresolver_new.py:186)."""
    return [p for p in name.split(".") if p]


def extract(host: str) -> tuple[str, str]:
    """(tld, sld) of a hostname. sld='' when the host IS a bare suffix
    or has no label above the suffix."""
    labels = split_labels(host)
    if not labels:
        return "", ""
    tld = labels[-1]
    n_suf = 1
    if len(labels) >= 2 and ".".join(labels[-2:]) in TWO_LABEL_SUFFIXES:
        tld = ".".join(labels[-2:])
        n_suf = 2
    elif labels[-1] not in ONE_LABEL_SUFFIXES:
        n_suf = 1  # unknown suffix: treat last label as the tld
    sld = ".".join(labels[-(n_suf + 1) :]) if len(labels) > n_suf else ""
    return tld, sld


def is_ps_host(host: str) -> bool:
    return host == PS_FACT_SUFFIX or host.endswith("." + PS_FACT_SUFFIX)


def labels_col(host: Column) -> Column:
    return F.filter(F.split(host, r"\."), lambda x: F.length(x) > 0)


def tld_col(host: Column) -> Column:
    labels = labels_col(host)
    last1 = F.element_at(labels, -1)
    last2 = F.concat_ws(".", F.element_at(labels, -2), last1)
    return F.when(
        (F.size(labels) >= 2) & last2.isin(*TWO_LABEL_SUFFIXES), last2
    ).otherwise(last1)


def sld_col(host: Column) -> Column:
    labels = labels_col(host)
    last1 = F.element_at(labels, -1)
    last2 = F.concat_ws(".", F.element_at(labels, -2), last1)
    n_suf = F.when(
        (F.size(labels) >= 2) & last2.isin(*TWO_LABEL_SUFFIXES), F.lit(2)
    ).otherwise(F.lit(1))
    return F.when(
        F.size(labels) > n_suf,
        F.array_join(F.slice(labels, -(n_suf + F.lit(1)), n_suf + F.lit(1)), "."),
    ).otherwise(F.lit(""))


def is_ps_host_col(host: Column) -> Column:
    return (host == PS_FACT_SUFFIX) | host.endswith("." + PS_FACT_SUFFIX)
