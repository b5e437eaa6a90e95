"""URL normalization and domain extraction — the web-corpus hygiene
columns (canonical URL dedup keys, per-domain caps, domain blocklists)
every crawl-derived training pipeline computes before anything else.

All pure codegen column expressions over the RE2∩Java-regex common subset
(no backreferences/lookaround — the same portability convention as
functions/text.scrub_pii), so every function has an exact DuckDB twin.

Scope note (documented, deliberate): registered-domain extraction uses the
structural eTLD+1 rule — last two labels, or last three when the
second-to-last label is a well-known second-level suffix (co/com/net/org/
gov/ac/edu + 2-letter ccTLD). The full Public Suffix List is a 10k-entry
data file, not an algorithm; pipelines that need it broadcast it as a dim
table and join on the suffix — the cap/blocklist operators below take the
domain COLUMN, so swapping in a PSL join changes nothing downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .hashing import md5_long

#: second-level labels under which the registrable domain takes three labels
_SECOND_LEVEL = "co|com|net|org|gov|ac|edu"


def url_normalize(url: Column) -> Column:
    """Canonical form: scheme and host lowercased, default ports stripped
    (:80 for http, :443 for https), fragment removed, trailing slash on a
    non-root path removed, bare host given explicit root path. Query
    strings are preserved verbatim (reordering parameters changes
    semantics on many sites; canonical-key pipelines that want it sort
    params downstream).

    DuckDB twin: the same anchored patterns with \\N backreference syntax
    (Spark's regexp_replace replaces all matches, DuckDB's only the first
    without the 'g' flag — every pattern below is ^-anchored, so all ==
    first == only; RE2 has no lookaround, so none is used)."""
    # 1. drop fragment (first '#' to end)
    c = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase scheme://host[:port] (the authority prefix only)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([^/]*//[^/?]*)", 1)),
        F.regexp_replace(c, r"^[^/]*//[^/?]*", ""),
    )
    # 3. strip default ports (a non-participating optional group
    #    substitutes as empty in both engines)
    c = F.regexp_replace(c, r"^(https://[^/:?]*):443($|[/?].*)", r"$1$2")
    c = F.regexp_replace(c, r"^(http://[^/:?]*):80($|[/?].*)", r"$1$2")
    # 4. trailing slashes on a non-root path (not the authority's own
    #    slash): /+ strips a run, so '/a//' and '/a/' both key as '/a';
    #    interior duplicate slashes are PRESERVED (path '//' is significant
    #    per RFC 3986 — collapsing would merge distinct resources), and an
    #    all-slash root path ('//') stays as-is for the same reason
    c = F.regexp_replace(c, r"^([a-z+.-]+://[^/?]+(/[^?]*[^/?]))/+(\?.*)?$", r"$1$3")
    # 5. bare authority -> explicit root
    c = F.regexp_replace(c, r"^([a-z+.-]+://[^/?]+)(\?.*)?$", r"$1/$2")
    return c


def url_host(url: Column) -> Column:
    """The lowercased host (no port, no userinfo): '' when unparseable.

    DuckDB twin: lower(regexp_extract(url, pattern, 1))."""
    return F.lower(
        F.regexp_extract(url, r"^[^/]*//(?:[^/@?]*@)?([^/:?#]+)", 1)
    )


def url_registered_domain(url: Column) -> Column:
    """Structural eTLD+1 of the host (see module scope note): b.co.uk for
    a.b.co.uk, example.com for x.y.example.com, the host itself when it has
    fewer labels or is an IPv4 literal."""
    host = url_host(url)
    is_ip = host.rlike(r"^[0-9.]+$")
    three = F.regexp_extract(
        host, rf"([^.]+\.(?:{_SECOND_LEVEL})\.[a-z][a-z])$", 1
    )
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(is_ip, host).when(three != "", three).when(two != "", two).otherwise(host)


def cap_per_domain(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    cap: int,
    salt: str = "dcap",
) -> DataFrame:
    """At most `cap` rows per domain, chosen by deterministic md5 order of
    (salt, id) — the per-domain diversity cap crawl pipelines apply so one
    megasite cannot dominate the corpus. One domain-key shuffle; the
    rank <= cap window compiles to Partial+Final WindowGroupLimit on
    Spark 4, so each map task forwards at most `cap` rows per domain."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = W.partitionBy(domain_col).orderBy(
        md5_long(F.col(id_col).cast("string"), seed=salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
