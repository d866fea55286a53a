"""URL canonicalization + keying (SURVEY §2.7 F1/F2/F12).

The reference canonicalizes names by lowercasing + trailing-dot
normalization (/root/reference/dnscrawler/dnsresolver_new.py:178-184);
the URL analog here: lowercase, strip fragment, strip default :80 port,
strip a lone trailing slash. The engine key is ``xxhash64(canonical
url)`` — Spark's built-in, JVM-side (north_rule: "canonicalized
xxhash64 URL keys").

Three equivalent implementations (tested for exact agreement):
``canonicalize_url`` (scalar, oracle), ``canonicalize_series`` (pandas,
Arrow batches), ``canon_url_col`` (Catalyst expression, the hot path —
no Python at all).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_PORT_RE = re.compile(r"^(https?://[^/]*):80(?=/|$)")


def canonicalize_url(url: str) -> str:
    u = url.strip().lower()
    i = u.find("#")
    if i >= 0:
        u = u[:i]
    u = _PORT_RE.sub(r"\1", u)
    if u.endswith("/") and u.count("/") > 2:
        u = u[:-1]
    return u


def canonicalize_series(urls: pd.Series) -> pd.Series:
    u = urls.str.strip().str.lower()
    u = u.str.split("#", n=1).str[0]
    u = u.str.replace(r"^(https?://[^/]*):80(?=/|$)", r"\1", regex=True)
    trailing = u.str.endswith("/") & (u.str.count("/") > 2)
    return u.mask(trailing, u.str.slice(0, -1))


def _strip_trailing(c: Column) -> Column:
    return F.substring(c, 1, F.length(c) - 1)


def canon_url_col(col: Column) -> Column:
    """Catalyst-only canonicalizer (whole-stage-codegen friendly).

    Shaped for the per-edge hot path (r6, guide §1.2 step 2 — this runs
    once per discovered edge, the engine's highest-volume expression):
    the ``:80`` regex only executes on rows that contain ``":80"`` at
    all (a byte scan; a non-matching row can't be changed by the
    regexp_replace, so the guard is result-identical), and the
    trailing-slash arity test counts ``/`` chars via ``translate``
    instead of materializing a split array per row
    (``size(split(c,"/")) > 3`` ⟺ at least three ``/`` ⟺
    ``length(c) − length(translate(c,"/","")) > 2``)."""
    c = F.lower(F.trim(col))
    c = F.substring_index(c, "#", 1)
    c = F.when(
        c.contains(":80"), F.regexp_replace(c, r"^(https?://[^/]*):80(/|$)", r"$1$2")
    ).otherwise(c)
    n_slash = F.length(c) - F.length(F.translate(c, "/", ""))
    return F.when(
        c.endswith("/") & (n_slash > 2), _strip_trailing(c)
    ).otherwise(c)


def url_key_col(canon_col: Column) -> Column:
    """Storage/dedup key: xxhash64 over the canonical URL (BIGINT)."""
    return F.xxhash64(canon_col)


def host_col(url_col: Column) -> Column:
    return F.regexp_extract(url_col, r"^[a-z]+://([^/:#]+)", 1)


def path_col(url_col: Column) -> Column:
    p = F.regexp_extract(url_col, r"^[a-z]+://[^/]*(/.*)$", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def host_of_url(url: str) -> str:
    m = re.match(r"^[a-z]+://([^/:#]+)", url)
    return m.group(1) if m else ""


def path_of_url(url: str) -> str:
    m = re.match(r"^[a-z]+://[^/]*(/.*)$", url)
    return m.group(1) if m else "/"
