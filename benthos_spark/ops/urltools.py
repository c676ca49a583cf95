"""URL canonicalization for web-corpus pipelines — pure Catalyst, no UDF.

Common-Crawl-style dedup keys on canonical url / host (the flagship pipeline
here keys its dedupe and windows on url_host), so url normalization is a
first-class corpus op: lowercase scheme+host, strip default ports and
fragments, drop tracking params (utm_*/fbclid/gclid), sort the remaining
query params, default empty paths to '/', and derive host, a
registered-domain heuristic (public-suffix-lite: ccTLD second-level labels
co/com/net/org/gov/ac/edu), and path depth.

Every formula is restricted to constructs with identical semantics in Java
regex + Spark collection functions and RE2 + DuckDB list functions (the
``sql_*`` builders emit the DuckDB twin), so the op ships with an exact
value-level cross-engine oracle like the rest of the suite. No lookaround,
no backreferences; ``regexp_extract`` returns '' on no-match in both
engines (verified). One divergence papered over in the SQL twin: DuckDB's
``array_to_string([])`` is NULL where Spark's ``array_join`` is '' —
hence the ``coalesce``.

Scale shape: one projection, no shuffle, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
QUERY_RE = r"^[^#]*\?([^#]*)"
TRACK_RE = r"^(utm_[^=]*|fbclid|gclid)="

# second-level labels under which a 2-char ccTLD forms a 3-label
# registered domain (example.co.uk) — the public-suffix-lite heuristic
_SLD = ("co", "com", "net", "org", "gov", "ac", "edu")


def _canon_cols(u: Column) -> dict:
    scheme = F.lower(F.regexp_extract(u, SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, AUTH_RE, 1))
    host = F.regexp_replace(auth, r":[0-9]+$", "")
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    drop_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    canon_auth = F.when(drop_port, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    path = F.regexp_extract(u, PATH_RE, 1)
    canon_path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, QUERY_RE, 1)
    params = F.array_sort(
        F.filter(F.split(q, "&"), lambda x: (x != "") & ~x.rlike(TRACK_RE))
    )
    qs = F.array_join(params, "&")
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        canon_auth,
        canon_path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    # registered domain: F.get (0-based, null out-of-range) keeps this safe
    # under ANSI mode for 1-label hosts, where element_at(-2) would raise
    labels = F.split(host, r"\.")
    n = F.size(labels)
    l1 = F.get(labels, n - 1)
    l2 = F.get(labels, n - 2)
    l3 = F.get(labels, n - 3)
    two = F.concat_ws(".", l2, l1)
    three = F.concat_ws(".", l3, l2, l1)
    regdom = (
        F.when((n >= 3) & l2.isin(*_SLD) & (F.length(l1) == 2), three)
        .when(n >= 2, two)
        .otherwise(host)
    )
    path_depth = F.size(F.filter(F.split(canon_path, "/"), lambda x: x != ""))
    return {
        "url_norm": url_norm,
        "host": host,
        "registered_domain": regdom,
        "path_depth": path_depth.cast("long"),
        "n_params": F.size(params).cast("long"),
    }


def url_canonicalize(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url_norm, host, registered_domain, path_depth, n_params)."""
    c = _canon_cols(F.col(url_col))
    return docs.select(
        F.col(id_col).alias("id"),
        c["url_norm"].alias("url_norm"),
        c["host"].alias("host"),
        c["registered_domain"].alias("registered_domain"),
        c["path_depth"].alias("path_depth"),
        c["n_params"].alias("n_params"),
    )


def sql_canon_ctes(url_expr: str, src: str, id_expr: str = "doc_id") -> str:
    """DuckDB CTE chain mirroring :func:`url_canonicalize` exactly; emits
    relation ``c`` with columns (id, url_norm, host, registered_domain,
    path_depth, n_params). Prepend your own ``with`` source if ``src`` is a
    subquery."""
    sld = ", ".join(f"'{s}'" for s in _SLD)
    return f"""
p as (select {id_expr} as id,
  lower(regexp_extract({url_expr}, '{SCHEME_RE}', 1)) as scheme,
  lower(regexp_extract({url_expr}, '{AUTH_RE}', 1)) as auth,
  regexp_extract({url_expr}, '{PATH_RE}', 1) as path,
  regexp_extract({url_expr}, '{QUERY_RE.replace("'", "''")}', 1) as q
  from {src}),
p2 as (select id, scheme,
  regexp_replace(auth, ':[0-9]+$', '') as host,
  regexp_extract(auth, ':([0-9]+)$', 1) as port,
  case when path = '' then '/' else path end as cpath,
  list_sort(list_filter(string_split(q, '&'),
    x -> x <> '' and not regexp_matches(x, '{TRACK_RE}'))) as params
  from p),
p3 as (select id, scheme, host, cpath, params,
  case when port = '' or (scheme = 'http' and port = '80')
         or (scheme = 'https' and port = '443')
       then host else host || ':' || port end as cauth,
  coalesce(array_to_string(params, '&'), '') as qs,
  string_split(host, '.') as labels
  from p2),
c as (select id,
  scheme || '://' || cauth || cpath ||
    (case when qs = '' then '' else '?' || qs end) as url_norm,
  host,
  case when len(labels) >= 3 and labels[-2] in ({sld})
            and length(labels[-1]) = 2
       then labels[-3] || '.' || labels[-2] || '.' || labels[-1]
       when len(labels) >= 2 then labels[-2] || '.' || labels[-1]
       else host end as registered_domain,
  len(list_filter(string_split(cpath, '/'), x -> x <> ''))::BIGINT as path_depth,
  len(params)::BIGINT as n_params
  from p3)"""
