"""`urls` transform: URL parsing, normalization, and dedup keys.

Training-data-pipeline extension (BASELINE.json north star): crawl
pipelines dedup and filter by URL long before touching page bytes.
Everything here is a pure ``Column`` tree — regexp_extract /
regexp_replace chains with no lookarounds, so the exact semantics are
reproducible in the DuckDB oracle and the op is map-only whole-stage
codegen at any scale (the same engine-portability rule the `scrub`
module follows).

Appended columns:
  url_scheme      lowercased scheme
  url_host        lowercased host, userinfo and port stripped
  url_domain      registrable-domain APPROXIMATION: the last two labels,
                  or three when the second-to-last is a common
                  country-code second-level (co/com/net/org/ac/gov/edu +
                  2-letter ccTLD).  The full Public Suffix List is a
                  data file, not an algorithm; this documented heuristic
                  covers the overwhelming bulk of crawl traffic.
  url_path        path component ('' → '/')
  url_normalized  scheme://host[:port]/path?query with: scheme+host
                  lowercased, default ports (http:80/https:443) dropped,
                  fragment dropped, tracking params removed (utm_*,
                  fbclid, gclid, msclkid, mc_cid/eid, igshid, ref,
                  ref_src), empty query dropped

Config: ``field`` (default "url"); ``stripWWW: true`` additionally
drops a leading ``www.`` from url_host/url_normalized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*):"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
# anchored through non-# chars so a '?' INSIDE the fragment never
# counts as a query start (fragment content must not leak into the
# normalized form)
_QUERY_RE = r"^[^#]*?\?([^#]*)"
# ccSLD heuristic: example.co.uk → example.co.uk, news.bbc.co.uk → bbc.co.uk
_CC_SLD_RE = r"([^.]+\.(?:co|com|net|org|ac|gov|edu)\.[a-z]{2})$"
_SLD_RE = r"([^.]+\.[^.]+)$"
_TRACKING_RE = (
    r"(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid"
    r"|igshid|ref|ref_src)=[^&]*"
)


def url_columns(col: Column, strip_www: bool = False) -> dict[str, Column]:
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    authority = F.regexp_extract(col, _AUTH_RE, 1)
    host = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))
    port = F.regexp_extract(host, r":([0-9]+)$", 1)
    host = F.regexp_replace(host, r":[0-9]+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(col, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(col, _QUERY_RE, 1)
    # strip tracking params, then mend separators
    q = F.regexp_replace(query, _TRACKING_RE, r"$1")
    q = F.regexp_replace(q, r"&&+", "&")
    q = F.regexp_replace(q, r"^&|&$", "")

    cc = F.regexp_extract(host, _CC_SLD_RE, 1)
    domain = F.when(cc != "", cc).otherwise(F.regexp_extract(host, _SLD_RE, 1))

    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    normalized = F.when(
        scheme == "",
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            port_part,
            path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )
    null_when_unparsed = F.when(scheme == "", F.lit(None).cast("string"))
    return {
        "url_scheme": null_when_unparsed.otherwise(scheme),
        "url_host": null_when_unparsed.otherwise(host),
        "url_domain": null_when_unparsed.otherwise(domain),
        "url_path": null_when_unparsed.otherwise(path),
        "url_normalized": normalized,
    }


@module("urls", kind=KIND_TRANSFORM)
def urls_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    field = p.get("field", "url")
    df = ctx.input
    if field not in df.columns:
        raise ValueError(f"urls: input has no column '{field}'")
    cols = url_columns(F.col(field), strip_www=bool(p.get("stripWWW", False)))
    for name, c in cols.items():
        df = df.withColumn(name, c)
    return {"": df}
