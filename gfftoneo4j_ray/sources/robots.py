"""robots.txt policies → a crawl-permission filter for fetch plans.

The missing governance step between the CDX fetch plan (sources/cdx.py)
and the WARC fetch: parse each host's robots.txt (RFC 9309, public)
into a slim per-host rule table, then filter a url table to the
crawl-allowed subset with longest-match semantics.

RFC 9309 semantics implemented:
  * groups of ``User-agent:`` lines followed by ``Allow:`` /
    ``Disallow:`` rules; a group with several user-agent lines shares
    its rules; line comments (``#``) stripped; field names
    case-insensitive;
  * group selection for a product token: the group(s) whose agent is
    the LONGEST token contained case-insensitively in the product
    token wins; otherwise the ``*`` group; no group → allow all;
  * rule matching: ``*`` matches any char run, ``$`` anchors the end;
    the rule with the LONGEST path expression wins; on a tie, allow
    wins; no matching rule or an empty-path rule → allow.

Scale shape: robots bodies are one tiny text file per HOST — the
policy table is host-cardinality (millions of slim rows at crawl
scale, never page-cardinality). ``filter_allowed`` ships the policy
through a bucketed hash join keyed on host and evaluates rules
vectorized per (host, rule): a batch does |rules-of-present-hosts|
RE2 passes over host-sliced url arrays, no per-url Python.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

POLICY_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("path_pattern", pa.string()),   # raw rule path, may hold * and $
    ("allow", pa.bool_()),
    ("rule_len", pa.int32()),        # longest-match precedence key
])


def parse_robots(content: str, agent: str = "raykgbot") -> list[tuple]:
    """robots.txt body → [(path_pattern, allow, rule_len)] for the
    group governing ``agent`` (RFC 9309 group selection). Empty list =
    everything allowed."""
    groups: list[tuple[list[str], list[tuple]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple] = []
    in_agent_run = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents:
                # empty-path rule is a no-op per RFC (matches nothing)
                if value:
                    cur_rules.append((value, field == "allow", len(value)))
        else:
            in_agent_run = False  # sitemap/crawl-delay end the run
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    tok = agent.lower()
    best: list[tuple] | None = None
    best_len = -1
    star: list[tuple] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = rules
            elif a and a in tok and len(a) > best_len:
                best, best_len = rules, len(a)
    chosen = best if best is not None else star
    return list(chosen) if chosen else []


def _rule_regex(path_pattern: str) -> str:
    """robots path expression → anchored RE2 pattern."""
    out = ["^"]
    for ch in path_pattern:
        if ch == "*":
            out.append("[\\s\\S]*")
        elif ch == "$":
            out.append("$")   # only meaningful at the end; harmless mid
        else:
            out.append(re.escape(ch))
    return "".join(out)


def policy_table(robots_ds, host_col: str = "host",
                 body_col: str = "body",
                 agent: str = "raykgbot"):
    """(host, robots.txt body) Dataset → POLICY_SCHEMA rule rows
    (hosts with no governing rules emit nothing = allow-all)."""
    def expand(t: pa.Table) -> pa.Table:
        hosts, pats, allows, lens = [], [], [], []
        for h, b in zip(t[host_col].to_pylist(), t[body_col].to_pylist()):
            for pat, allow, ln in parse_robots(b or "", agent):
                hosts.append(h)
                pats.append(pat)
                allows.append(allow)
                lens.append(ln)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "path_pattern": pa.array(pats, pa.string()),
            "allow": pa.array(allows, pa.bool_()),
            "rule_len": pa.array(lens, pa.int32()),
        })

    return robots_ds.map_batches(expand, batch_format="pyarrow")


def _path_of(urls: pa.Array) -> pa.Array:
    """url → path-and-after ('/' when absent), vectorized."""
    tail = pc.replace_substring_regex(
        urls, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    return pc.if_else(pc.equal(tail, ""), pa.scalar("/"), tail)


def _decide(paths: np.ndarray, rules: list[tuple]) -> np.ndarray:
    """Longest-match verdict per path against one host's rules.
    rules: [(pattern, allow, rule_len)], vectorized per rule."""
    n = len(paths)
    arr = pa.array(paths, pa.string())
    best_len = np.full(n, -1, np.int64)
    verdict = np.ones(n, bool)                   # no match → allow
    # allow before disallow within a length so ties resolve to allow
    for pat, allow, ln in sorted(rules,
                                 key=lambda r: (r[2], r[1])):
        hit = pc.match_substring_regex(arr, _rule_regex(pat)) \
            .to_numpy(zero_copy_only=False)
        hit = np.asarray(hit, bool)
        upd = hit & (ln >= best_len)             # ≥: later allow wins tie
        verdict[upd] = allow
        best_len[upd] = ln
    return verdict


def filter_allowed(urls_ds, policy_ds, url_col: str = "url", *,
                   num_buckets: int = 32):
    """Filter a url-bearing Dataset to crawl-allowed rows.

    ``policy_ds``: a POLICY_SCHEMA Dataset (from :func:`policy_table`).
    The policy joins on the url's host (LEFT join — hosts without
    rules stay allowed), then one vectorized longest-match pass per
    (host, rule) decides. Adds nothing to the schema; disallowed rows
    are dropped.

    Contract: input rows are unique per url (the fetch-plan shape —
    :func:`sources.cdx.plan_fetch` output is): the join multiplies
    each url by its host's rule count and the verdict pass reduces
    back to one row per url. The reduction is block-safe because the
    join buckets BY HOST (a host's rule rows never split) and the
    verdict map runs per whole block (batch_size=None below)."""
    from ..ops.join import hash_join
    from ..stages.links import host_of_array

    base = getattr(urls_ds.schema(), "base_schema", None)

    def add_host(t: pa.Table) -> pa.Table:
        return t.append_column("_host", host_of_array(t[url_col]))

    with_host = urls_ds.map_batches(add_host, batch_format="pyarrow")
    left_schema = None
    if base is not None:
        left_schema = pa.schema(list(base) + [("_host", pa.string())])
    joined = hash_join(
        with_host, policy_ds, on="_host", right_on="host", how="left",
        num_buckets=num_buckets, left_schema=left_schema,
        right_schema=POLICY_SCHEMA)

    out_cols = [f.name for f in base] if base is not None else None

    def apply_rules(t: pa.Table) -> pa.Table:
        # rows multiplied per matching rule by the join: group by
        # (host), decide once per distinct url set, keep rule-less rows
        cols = out_cols or [c for c in t.column_names
                            if c not in ("_host", "path_pattern",
                                         "allow", "rule_len")]
        if t.num_rows == 0:
            return t.select(cols)
        import pandas as pd

        df = t.to_pandas()
        no_rules = df["path_pattern"].isna()
        kept = [df.loc[no_rules, cols]]   # left-join misses: 1 row each
        ruled = df[~no_rules]
        for host, g in ruled.groupby("_host", sort=True):
            rules = list({(p, bool(a), int(ln)) for p, a, ln in zip(
                g["path_pattern"], g["allow"], g["rule_len"])})
            uniq = g.drop_duplicates(subset=[url_col])
            paths = _path_of(pa.array(uniq[url_col].astype(str))) \
                .to_numpy(zero_copy_only=False)
            ok = _decide(paths, rules)
            kept.append(uniq.loc[ok, cols])
        out = pd.concat(kept, ignore_index=True)
        return pa.Table.from_pandas(out[cols], preserve_index=False)

    # batch_size=None: one batch per block = per join bucket, so a
    # host's url×rule rows are never split across verdict batches
    return joined.map_batches(apply_rules, batch_format="pyarrow",
                              batch_size=None)
