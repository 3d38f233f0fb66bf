"""URL / domain curation operators for web-scale corpus building.

Common-Crawl-style pipelines filter and budget documents by their
source URL long before any text analysis: per-registrable-domain
statistics, blocklist removal, and per-domain document caps (one hot
domain must not dominate a pretraining mixture). The reference pipeline
has no web-corpus surface at all — these extend the engine's
training-data capabilities (SURVEY §2 extension family, like
`textops`/`dedup`).

Everything here is a scan-stage Column expression built from JVM
primitives (`parse_url`, `split`, `slice`, `concat_ws`) — no Python in
the row path, whole-stage codegen applies, and the only shuffles are
the ones the caller's aggregation/cap asks for. At 100 TB the domain
extraction adds zero exchanges; the blocklist filter is a broadcast
anti-join (blocklists are MB-sized, corpora are not); the per-domain
cap is one shuffle on the domain key.

The registrable-domain rule is a deliberately bounded heuristic, not
the full Public Suffix List: the last two host labels, or the last
THREE when the second-level label is a well-known multi-part suffix
('example.co.uk' → 'example.co.uk', not 'co.uk'). IP-literal hosts are
their own "domain". A deployment needing exact PSL semantics swaps
``registered_domain_col`` for a broadcast-joined suffix table — the
operator shape (scan-stage derive → group/filter on the derived key)
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# second-level labels that commonly precede a country-code TLD
# (the bounded stand-in for the Public Suffix List; see module doc)
MULTI_PART_SLDS = ("co", "com", "ac", "gov", "edu", "org", "net")

_IP_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def url_host_col(url_col: str = "url") -> Column:
    """Lowercased host of a URL (JVM ``try_parse_url``; no Python).
    ``try_`` matters: under ANSI mode (this engine's deliberate
    default) plain ``parse_url`` throws INVALID_URL on the garbage a
    real crawl reliably contains — one bad row would kill the whole
    curation job. NULL host instead; downstream domain logic
    propagates the NULL."""
    return F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))


def registered_domain_col(host: Column) -> Column:
    """Registrable domain of a host under the bounded suffix rule:
    last two labels, last three when the second-level label is a known
    multi-part suffix, the host itself for IP literals."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sld = F.element_at(labels, -2)
    take = F.when(
        (n >= 3) & sld.isin(*MULTI_PART_SLDS), F.lit(3)
    ).otherwise(F.least(n, F.lit(2)))
    dom = F.concat_ws(".", F.slice(labels, n - take + 1, take))
    # a NULL host (unparseable URL, or host-less schemes like mailto:)
    # must stay NULL — concat_ws never returns NULL, so without the
    # guard every host-less row would collapse into one phantom ''
    # domain and a per-domain cap would silently discard all but k of
    # them as if they were one site
    return F.when(host.isNull(), F.lit(None).cast("string")).when(
        host.rlike(_IP_RE), host
    ).otherwise(dom)


def path_depth_col(url_col: str = "url") -> Column:
    """Number of non-empty path segments ('/a/b' → 2, '/' or none → 0).
    ``try_parse_url`` for the same ANSI-survival reason as the host."""
    path = F.coalesce(
        F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("")
    )
    return F.size(F.filter(F.split(path, "/"), lambda s: s != ""))


def with_url_parts(
    df: DataFrame, url_col: str = "url", prefix: str = ""
) -> DataFrame:
    """Attach ``host`` / ``registered_domain`` / ``path_depth`` /
    ``is_ip_host`` columns — one scan-stage projection."""
    host = url_host_col(url_col)
    return (
        df.withColumn(prefix + "host", host)
        .withColumn(
            prefix + "registered_domain",
            registered_domain_col(F.col(prefix + "host")),
        )
        .withColumn(prefix + "path_depth", path_depth_col(url_col))
        .withColumn(
            prefix + "is_ip_host", F.col(prefix + "host").rlike(_IP_RE)
        )
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    domain_col: str = "registered_domain",
    drop_ip_hosts: bool = False,
    ip_host_col: str = "is_ip_host",
) -> DataFrame:
    """Remove documents whose registrable domain appears in a blocklist
    table (one column named ``domain_col``). Broadcast LEFT ANTI join:
    the blocklist (MBs even for millions of entries) ships to every
    executor, the corpus never shuffles. ``drop_ip_hosts`` additionally
    removes IP-literal hosts (they evade any name-based list)."""
    out = df.join(
        F.broadcast(blocklist.select(domain_col).distinct()),
        on=domain_col,
        how="left_anti",
    )
    if drop_ip_hosts:
        out = out.where(~F.col(ip_host_col))
    return out


def cap_per_domain(
    df: DataFrame,
    k: int,
    domain_col: str = "registered_domain",
    order_col: str = "n_chars",
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``k`` documents per domain, best-``order_col``
    first (ties broken deterministically) — the mixture-balance cap
    that stops one crawled site from dominating a corpus. One shuffle
    on the domain key; `WindowGroupLimit` prunes rows below the cap
    before the final sort at scale.

    NULL domains (garbage URLs, host-less schemes) are NOT one site:
    each such row gets a synthetic per-row partition key, so it passes
    the cap individually — capping them as a single group would both
    discard real documents and funnel every unparseable-URL row on the
    corpus into ONE straggler task."""
    part_key = F.coalesce(
        F.col(domain_col),
        F.concat(F.lit("\0null-"), F.col(tiebreak_col).cast("string")),
    )
    w = Window.partitionBy(part_key).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .where(F.col("_cap_rn") <= k)
        .drop("_cap_rn")
    )
