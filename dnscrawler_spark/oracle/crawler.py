"""Pure-Python oracle crawler: the normalized reference semantics.

The reference (/root/reference/dnscrawler/dnsresolver_new.py) cannot run
offline (live DNS), and its order is only deterministic up to
``random.choice`` and Python set iteration (SURVEY §7.3). This oracle
*defines* the normalized semantics both sides must produce — memo/seen
dedup, glue-first priority, in-flight cycle break, carry-forward,
retry-then-missing classification, politeness budgets — as a
single-threaded loop with sorted iteration everywhere.

Parity contract with the Spark engine (north_rule):
- identical final URL-seen set,
- identical crawl trace [(round, url)] under the same seed list and
  politeness budget,
- identical per-seed fact sets.

No Spark imports: the oracle consumes plain page dicts (from
``datagen.page_row`` or a collected DataFrame).
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field

from dnscrawler_spark.datagen import fail_code, host_policy, qmin_fallback_url
from dnscrawler_spark.functions.canon import canonicalize_url, host_of_url, path_of_url
from dnscrawler_spark.functions.suffix import extract, is_ps_host

P_SEED, P_GLUE, P_EXPAND, P_CARRY, P_QMIN, P_RETRY_BASE = 0, 1, 2, 3, 4, 10


@dataclass
class OracleResult:
    seen: set[str] = field(default_factory=set)
    trace: list[tuple[int, str]] = field(default_factory=list)
    # (round, host, priority, depth, url) — the digest parity object
    trace_full: list[tuple[int, str, int, int, str]] = field(default_factory=list)
    facts: dict[str, dict[str, set[str]]] = field(default_factory=dict)  # seed→kind→values
    # seed → fail_class → [(url, src, code, round, attempts)] — the
    # QuerySummaryList analog with the full QuerySummary fields: name /
    # nameserver / rcodes (/root/reference/dnscrawler/querysummary.py:3-9,
    # querysummarylist.py:4-9). ``src`` = the probed host (nameserver
    # analog), ``code`` = the deterministic response code (rcodes analog).
    failure_detail: dict[str, dict[str, list[tuple[str, str, str, int, int]]]] = field(
        default_factory=dict
    )
    rounds: int = 0
    # per-round wave-boundary carry-band size (the engine's n_carry
    # Observation twin) — lets tests independently identify carry-free
    # rounds when gating the engine's wave-B skip (VERDICT r4 #5)
    carry_per_round: list = field(default_factory=list)

    def fact(self, seed: str, kind: str, value: str) -> None:
        self.facts.setdefault(seed, defaultdict(set))[kind].add(value)

    def failure(
        self, seed: str, cls: str, url: str, src: str, code: str, rnd: int, attempts: int
    ) -> None:
        self.failure_detail.setdefault(seed, defaultdict(list))[cls].append(
            (url, src, code, rnd, attempts)
        )


@dataclass
class _Entry:
    url: str
    host: str
    priority: int
    depth: int
    reason: str
    seed: str
    attempts: int = 0

    def order_key(self):
        return (self.priority, self.depth, self.url)


def crawl(
    pages: list[dict],
    seed_urls: list[str],
    rate_scale: float = 1.0,
    max_rounds: int = 64,
    gen_seed: int = 42,
    seed_budget: int | None = None,
    # the reference runs two waves unconditionally (dnsresolver_new.py:
    # 210 `for i in range(2)`) — two-wave is the reference-faithful
    # default; single-wave remains available for the leaner loop
    two_wave: bool = True,
) -> OracleResult:
    by_url = {p["url"]: p for p in pages}
    hosts = sorted({p["host"] for p in pages})
    policy = {h: host_policy(h, rate_scale) for h in hosts}
    tokens = {h: policy[h]["burst"] for h in hosts}

    res = OracleResult()
    frontier: list[_Entry] = []
    for u in dict.fromkeys(canonicalize_url(x) for x in seed_urls):
        frontier.append(_Entry(u, host_of_url(u), P_SEED, 0, "seed", u))

    glue: set[str] = set()
    fetch_counts: dict[str, int] = defaultdict(int)
    r = 0
    while frontier and r < max_rounds:
        # --- per-seed budget (round-granular, run/run.py:59 analog) -----
        if seed_budget is not None:
            kept = []
            for e in frontier:
                if fetch_counts[e.seed] >= seed_budget:
                    res.fact(e.seed, "budget_exceeded", e.url)
                    res.seen.add(e.url)
                else:
                    kept.append(e)
            frontier = kept
            if not frontier:
                break

        # --- refill (politeness.refill) --------------------------------
        for h in hosts:
            tokens[h] = min(policy[h]["burst"], tokens[h] + policy[h]["rate"])

        def robots_and_admit(entries):
            """Robots gate + per-host top-budget admission (one wave)."""
            blocked, candid = [], []
            for e in entries:
                pol = policy.get(e.host)
                dis = pol["robots_disallow"] if (pol and pol["robots_fetched"]) else []
                if any(path_of_url(e.url).startswith(p) for p in dis):
                    blocked.append(e)
                else:
                    candid.append(e)
            for e in blocked:
                res.fact(e.seed, "robots_blocked", e.url)
                res.seen.add(e.url)
            by_host = defaultdict(list)
            for e in candid:
                by_host[e.host].append(e)
            admitted, leftover = [], []
            for h in sorted(by_host):
                q = sorted(by_host[h], key=_Entry.order_key)
                budget = int(math.floor(tokens.get(h, 1.0)))
                admitted.extend(q[:budget])
                leftover.extend(q[budget:])
                if h in tokens:
                    tokens[h] -= len(q[:budget])
            return admitted, leftover

        def fetch_classify(admitted):
            fetched, retries, qmin_fallbacks = [], [], []
            for e in admitted:
                page = by_url.get(e.url)
                if page is not None:
                    fetched.append((e, page))
                    continue
                last_label = e.host.rsplit(".", 1)[-1]
                if last_label.isdigit():
                    res.fact(e.seed, "ip_ns_records", e.url)
                    res.failure(
                        e.seed, "ip_ns_records", e.url, e.host,
                        fail_code(e.url, gen_seed), r, e.attempts,
                    )
                    res.seen.add(e.url)
                elif "/dead-r/" in e.url and e.attempts == 0:
                    retries.append(
                        _Entry(e.url, e.host, e.priority + P_RETRY_BASE, e.depth, "retry", e.seed, 1)
                    )
                elif "/dead-q/" in e.url and e.attempts == 0:
                    # QNAME-minimization fallback (O7, dnsresolver_new.py:
                    # 216,223-226): the minimized form misses; requery
                    # the full name as a new candidate
                    fb = qmin_fallback_url(e.url, gen_seed)
                    res.fact(e.seed, "qmin_requery", e.url)
                    res.seen.add(e.url)
                    if fb:
                        qmin_fallbacks.append((canonicalize_url(fb), e.depth, e.seed))
                elif e.attempts >= 1:
                    res.fact(e.seed, "missing_ns_records", e.url)
                    res.failure(
                        e.seed, "missing_ns_records", e.url, e.host,
                        fail_code(e.url, gen_seed), r, e.attempts,
                    )
                    res.seen.add(e.url)
                else:
                    res.fact(e.seed, "hazardous", e.url)
                    res.failure(
                        e.seed, "hazardous", e.url, e.host,
                        fail_code(e.url, gen_seed), r, e.attempts,
                    )
                    res.seen.add(e.url)
            return fetched, retries, qmin_fallbacks

        def facts_and_glue(fetched):
            """Pass 1 over responses: facts + glue accumulation; returns
            this wave's trace rows."""
            rows = []
            for e, page in fetched:
                res.seen.add(e.url)
                rows.append((e.host, e.priority, e.depth, e.url))
                tld, sld = extract(e.host)
                pre = "ps_" if is_ps_host(e.host) else ""
                res.fact(e.seed, pre + "url", e.url)
                res.fact(e.seed, pre + "host", e.host)
                if tld:
                    res.fact(e.seed, pre + "tld", tld)
                if sld:
                    res.fact(e.seed, pre + "sld", sld)
                for g in page["glue_edges"]:
                    glue.add(canonicalize_url(g))
            return rows

        def expand(fetched, qmin_fallbacks):
            """Pass 2: edges, glue priority, within-wave dedup."""
            cand = {}
            for e, page in fetched:
                edges = page["out_edges"] if page["out_edges"] else page["carry_edges"]
                carry = not page["out_edges"]
                for raw in edges:
                    cu = canonicalize_url(raw)
                    if carry:
                        prio, reason = P_CARRY, "carry"
                    elif cu in glue:
                        prio, reason = P_GLUE, "glue"
                    else:
                        prio, reason = P_EXPAND, "expand"
                    key = (prio, e.depth + 1, e.seed)
                    if cu not in cand or key < cand[cu][0]:
                        cand[cu] = (key, reason)
            for cu, depth, seed in qmin_fallbacks:
                # full-name requery rides the same glue check + dedup as
                # any discovered edge (engine: expand_candidates extras)
                if cu in glue:
                    prio, reason = P_GLUE, "glue"
                else:
                    prio, reason = P_QMIN, "qmin"
                key = (prio, depth, seed)
                if cu not in cand or key < cand[cu][0]:
                    cand[cu] = (key, reason)
            return cand

        def resolve(cand, inflight):
            """Seen dedup + glue short-circuit + cycle break -> new rows."""
            new_rows = []
            for cu in sorted(cand):
                (prio, depth, seed), reason = cand[cu]
                if cu in res.seen:
                    continue  # memo hit (J3)
                if reason == "glue":
                    # glue short-circuit (dnsresolver_new.py:125-126):
                    # the glue payload IS the resolution — same facts a
                    # fetch would yield, mark seen, never enqueue/fetch
                    host = host_of_url(cu)
                    tld, sld = extract(host)
                    pre = "ps_" if is_ps_host(host) else ""
                    res.fact(seed, pre + "url", cu)
                    res.fact(seed, pre + "host", host)
                    if tld:
                        res.fact(seed, pre + "tld", tld)
                    if sld:
                        res.fact(seed, pre + "sld", sld)
                    res.fact(seed, "glue_resolved", cu)
                    res.seen.add(cu)
                    continue
                if cu in inflight:
                    res.fact(seed, "nonhazardous", cu)  # cycle break (P11)
                    continue
                new_rows.append(_Entry(cu, host_of_url(cu), prio, depth, reason, seed))
            return new_rows

        # ---- wave A ------------------------------------------------------
        admitted, leftover = robots_and_admit(frontier)
        fetched, retries, qmin_fb = fetch_classify(admitted)
        trace_rows = facts_and_glue(fetched)
        cand = expand(fetched, qmin_fb)
        inflight = {e.url for e in leftover} | {e.url for e in retries}
        new_rows = resolve(cand, inflight)
        fetched_all = list(fetched)

        if two_wave:
            # ---- wave B (W3, dnsresolver_new.py:210 `for i in range(2)`):
            # the freshly learned zone-cut set (carry-band discoveries) is
            # queried again within the SAME round, against the remaining
            # politeness budget
            carry_rows = [e for e in new_rows if e.reason == "carry"]
            rest = [e for e in new_rows if e.reason != "carry"]
            res.carry_per_round.append(len(carry_rows))
            admitted_b, leftover_b = robots_and_admit(carry_rows)
            fetched_b, retries_b, qmin_fb_b = fetch_classify(admitted_b)
            trace_rows += facts_and_glue(fetched_b)
            cand_b = expand(fetched_b, qmin_fb_b)
            inflight2 = (
                inflight
                | {e.url for e in rest}
                | {e.url for e in leftover_b}
                | {e.url for e in retries_b}
            )
            new_b = resolve(cand_b, inflight2)
            frontier = leftover + retries + rest + leftover_b + retries_b + new_b
            fetched_all += fetched_b
        else:
            res.carry_per_round.append(
                sum(1 for e in new_rows if e.reason == "carry")
            )
            frontier = leftover + retries + new_rows

        trace_rows.sort()
        res.trace.extend((r, t[3]) for t in trace_rows)
        res.trace_full.extend((r, t[0], t[1], t[2], t[3]) for t in trace_rows)
        for e, _page in fetched_all:
            fetch_counts[e.seed] += 1  # budget state for NEXT round's check
        r += 1

    res.rounds = r
    return res
