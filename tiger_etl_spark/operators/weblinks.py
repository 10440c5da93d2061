"""Outlink extraction and host-level web-graph construction over
Common-Crawl-style pages ``(url, html)``.

This is the standard CC-webgraph pipeline stage: pull ``href`` targets
out of raw html, resolve them against the page url, reduce page→page
links to a ``(src_host, dst_host, n_links)`` host graph, then feed the
existing graph operators (``operators/graph.py`` degrees / PageRank /
k-hop) — the same composition Common Crawl publishes as its host-level
webgraph release.

Everything here is a JVM-side column expression (``regexp_extract_all``
/ ``regexp_replace`` inside whole-stage codegen): no Python — not even a
pandas UDF — touches the hot path, so the per-page cost is one regex
scan over the html bytes and the only shuffle in the whole pipeline is
the final (src_host, dst_host) aggregation, which is map-side combined.
At 10^10 pages the extraction is embarrassingly parallel over the scan
tasks and the host-graph agg shuffles only the already-tiny
(host, host) pairs.

The reference (a FastAPI/SQLAlchemy CRUD app) has no web-graph surface;
this extends the engine's webtext tier (BASELINE.json input_hint
``html:binary``) in the style of its ``_extract_device_info`` substring
classifier (modules/authentication_management/session_manager.py:208-247)
— deterministic, dependency-free parsing, lifted to columnar form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One regex source of truth, shared with the DuckDB oracles (RE2) and
# the pure-Python reference extractor in tests (CPython `re`): the
# subset used (character classes, \s, capture group, non-greedy-free)
# has identical semantics in all three engines.
HREF_PATTERN = r"""href\s*=\s*["']([^"']+)["']"""

# Full <a …>text</a> element: capture 1 = href value, capture 2 = the
# (tag-free) anchor text. Same cross-engine-safe regex subset as
# HREF_PATTERN; anchors whose text contains nested tags are skipped by
# design ([^<]*) — malformed/nested markup is noise for anchor-text
# harvesting.
ANCHOR_PATTERN = r"""<a\s[^>]*href\s*=\s*["']([^"']+)["'][^>]*>([^<]*)</a>"""

# Page-metadata patterns (same cross-engine-safe regex subset — shared
# verbatim with the RE2 oracles): head <title>, <meta name=… content=…>
# (attribute order name-then-content, the emitted-markup convention),
# and <link rel="canonical" href=…>. (?i) is honored identically by
# Java regex and RE2.
TITLE_PATTERN = r"(?i)<title[^>]*>([^<]*)</title>"
META_DESCRIPTION_PATTERN = (
    r"""(?i)<meta\s[^>]*name\s*=\s*["']description["']"""
    r"""[^>]*content\s*=\s*["']([^"']*)["']"""
)
META_ROBOTS_PATTERN = (
    r"""(?i)<meta\s[^>]*name\s*=\s*["']robots["']"""
    r"""[^>]*content\s*=\s*["']([^"']*)["']"""
)
CANONICAL_PATTERN = (
    r"""(?i)<link\s[^>]*rel\s*=\s*["']canonical["']"""
    r"""[^>]*href\s*=\s*["']([^"']+)["']"""
)

# Schemes / pseudo-links that never produce a fetchable http target.
_NON_HTTP_RE = r"^(javascript:|mailto:|tel:|data:|#)"

# Host part of an absolute http(s) url: no slash, port, query, fragment.
_HOST_RE = r"^https?://([^/:?#]+)"
# Origin (scheme + host[:port]) of an absolute http(s) url.
_ORIGIN_RE = r"^(https?://[^/?#]+)"


def raw_hrefs(html: Column) -> Column:
    """array<string> of raw ``href`` attribute values in document order.

    ``html`` may be BINARY (cast decodes UTF-8) or STRING. Pure codegen:
    one `regexp_extract_all` over the page bytes.
    """
    return F.regexp_extract_all(
        html.cast("string"), F.lit(HREF_PATTERN), F.lit(1)
    )


def resolve_link(base_url: Column, link: Column) -> Column:
    """Resolve one extracted href against its page url; NULL for
    non-http pseudo-links (javascript:, mailto:, fragments, …).

    Deterministic resolution rules (the RFC 3986 cases that matter for
    a host graph; query/fragment normalization is intentionally out of
    scope):

    - absolute ``http(s)://…``      → kept as-is
    - protocol-relative ``//h/p``   → base scheme + ``:`` + link
    - root-relative ``/p``          → base origin + link
    - anything else (relative path) → base directory + link
    """
    scheme = F.regexp_extract(base_url, r"^(https?):", 1)
    origin = F.regexp_extract(base_url, _ORIGIN_RE, 1)
    base_dir = F.regexp_replace(base_url, r"[^/]*$", "")
    return (
        F.when(link.rlike(_NON_HTTP_RE), F.lit(None).cast("string"))
        .when(link.rlike(r"^https?://"), link)
        .when(link.startswith("//"), F.concat(scheme, F.lit(":"), link))
        .when(link.startswith("/"), F.concat(origin, link))
        .otherwise(F.concat(base_dir, link))
    )


def host_of(url: Column) -> Column:
    """Lower-cased host of an absolute http(s) url; NULL otherwise."""
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def extract_outlinks(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    out_col: str = "link",
) -> DataFrame:
    """One row per (page, resolved outlink).

    Non-http pseudo-links are dropped; duplicates within a page are
    KEPT (multiplicity is meaningful for link-weight graphs — the
    host-edge agg counts them). All input columns except ``html_col``
    pass through (ids, timestamps, …), plus ``out_col``.
    """
    keep = [c for c in df.columns if c != html_col]
    exploded = df.select(
        *keep,
        F.explode(raw_hrefs(F.col(html_col))).alias("_raw_href"),
    )
    resolved = exploded.select(
        *keep,
        resolve_link(F.col(url_col), F.col("_raw_href")).alias(out_col),
    )
    return resolved.where(F.col(out_col).isNotNull())


def extract_anchors(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    link_col: str = "link",
    text_col: str = "anchor_text",
) -> DataFrame:
    """One row per (page, resolved outlink, anchor text) — the
    anchor-text harvest used by webtext training pipelines (anchor text
    is a natural-language description of the TARGET page, e.g.
    MassiveWeb-style anchor conditioning).

    Same codegen-only shape as :func:`extract_outlinks`: one
    `regexp_extract_all` scan pulls whole ``<a …>text</a>`` elements,
    then two tiny per-match group extracts — no second pass over the
    html bytes, no Python. Anchors with non-http targets are dropped;
    anchor text is whitespace-trimmed, may be empty.
    """
    keep = [c for c in df.columns if c != html_col]
    matches = df.select(
        *keep,
        F.explode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"), F.lit(ANCHOR_PATTERN), F.lit(0)
            )
        ).alias("_a"),
    )
    out = matches.select(
        *keep,
        resolve_link(
            F.col(url_col), F.regexp_extract("_a", ANCHOR_PATTERN, 1)
        ).alias(link_col),
        F.trim(F.regexp_extract("_a", ANCHOR_PATTERN, 2)).alias(text_col),
    )
    return out.where(F.col(link_col).isNotNull())


def _first_match_or_null(html: Column, pattern: str) -> Column:
    """First capture-group match of ``pattern`` in the page, NULL when
    absent (`regexp_extract` returns '' on no-match; pages that really
    contain an empty attribute also map to NULL — the indexing
    convention: empty metadata is no metadata)."""
    m = F.regexp_extract(html.cast("string"), pattern, 1)
    return F.when(m == "", F.lit(None).cast("string")).otherwise(m)


def page_meta_cols(url: Column, html: Column) -> dict[str, Column]:
    """The head-metadata fields as name → Column expressions (the
    shared kernel of :func:`extract_page_meta` and the ingest-time
    enricher preset `cdc.pipeline.page_meta_enrichers`): one codegen'd
    regex pass per field, suitable for computing on LWW winners inside
    the fused merge stage with no extra shuffle."""
    robots = F.lower(
        F.coalesce(_first_match_or_null(html, META_ROBOTS_PATTERN), F.lit(""))
    )
    canonical_raw = _first_match_or_null(html, CANONICAL_PATTERN)
    return {
        "title": _first_match_or_null(html, TITLE_PATTERN),
        "meta_description": _first_match_or_null(
            html, META_DESCRIPTION_PATTERN
        ),
        "canonical_url": resolve_link(url, canonical_raw),
        "robots": F.when(robots == "", F.lit(None).cast("string")).otherwise(
            robots
        ),
        "noindex": robots.contains("noindex"),
        "nofollow": robots.contains("nofollow"),
    }


def extract_page_meta(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page head metadata — the standard crawl-indexing stage that
    runs right after fetch (Common Crawl publishes the same fields in
    its columnar index): ``title``, ``meta_description``, the resolved
    ``canonical_url`` (rel=canonical href run through the same
    :func:`resolve_link` rules as outlinks), the raw ``robots``
    directive string, and the two boolean gates every training-data
    crawl pipeline filters on, ``noindex`` / ``nofollow``.

    Same execution shape as :func:`extract_outlinks`: one codegen'd
    regex pass per field over the html bytes, zero Python, zero
    shuffles — embarrassingly parallel over the scan tasks at 10^10
    pages. All input columns except ``html_col`` pass through, so the
    stream composes with per-row machinery (dirty-bucket incremental
    views, enrichment DDL at ingest).

    The reference has no crawl surface; this extends its
    substring-classifier idiom (_extract_device_info,
    modules/authentication_management/session_manager.py:208-247) to
    the webtext tier's ``html:binary`` input (BASELINE.json input_hint).
    """
    keep = [c for c in df.columns if c != html_col]
    cols = page_meta_cols(F.col(url_col), F.col(html_col))
    return df.select(*keep, *[c.alias(n) for n, c in cols.items()])


def host_pairs(
    outlinks: DataFrame,
    url_col: str = "url",
    link_col: str = "link",
    drop_self_loops: bool = True,
) -> DataFrame:
    """Per-link ``(…, src_host, dst_host)`` rows — the pre-aggregation
    form of :func:`host_edges`. Rows whose either host fails to parse
    are dropped; ``drop_self_loops`` removes intra-host links (the CC
    host-graph convention). All columns other than ``url_col`` /
    ``link_col`` pass through — each output row derives from exactly
    ONE input row, so the stream composes with per-row machinery like
    dirty-bucket incremental views (cdc/ivm.py)."""
    keep = [c for c in outlinks.columns if c not in (url_col, link_col)]
    e = outlinks.select(
        *keep,
        host_of(F.col(url_col)).alias("src_host"),
        host_of(F.col(link_col)).alias("dst_host"),
    ).where(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if drop_self_loops:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return e


def host_edges(
    outlinks: DataFrame,
    url_col: str = "url",
    link_col: str = "link",
    drop_self_loops: bool = True,
) -> DataFrame:
    """Aggregate page→page outlinks into the host-level webgraph:
    ``(src_host, dst_host, n_links)``.

    One map-side-combined shuffle on (src_host, dst_host) over the
    :func:`host_pairs` stream.
    """
    return (
        host_pairs(outlinks, url_col, link_col, drop_self_loops)
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def host_edges_view(
    path: str,
    url_col: str = "url",
    html_col: str = "html",
    drop_self_loops: bool = True,
):
    """Incrementally-maintained host webgraph over a CDC-merged pages
    LakeTable: an ``IncrementalAggView`` (cdc/ivm.py) whose per-bucket
    refresh re-extracts outlinks ONLY from the pages in buckets the last
    commits touched and whose ``read()`` returns
    ``(src_host, dst_host, n_links)`` — identical to running
    :func:`host_edges` over a full rescan, at per-micro-batch cost
    proportional to the batch, not the table.

    Correctness rides on the IVM flat-map contract: every
    (src_host, dst_host) pair derives from exactly one page row, so a
    page's insert/update/delete can only change pairs attributed to its
    own bucket. At 10^10 pages a full re-extraction per batch is the
    difference between rescanning ~100 TB of html and re-scanning a few
    hundred MB of touched buckets.
    """
    from tiger_etl_spark.cdc.ivm import IncrementalAggView

    def _links(pages: DataFrame) -> DataFrame:
        return host_pairs(
            extract_outlinks(pages, url_col=url_col, html_col=html_col),
            url_col=url_col,
            drop_self_loops=drop_self_loops,
        )

    return IncrementalAggView(
        path,
        ["src_host", "dst_host"],
        {"n_links": (None, "count")},
        transform=_links,
    )


# robots.txt line grammar (the subset with identical semantics in Java
# regex and RE2, shared verbatim with the SQL oracle): group headers and
# allow/disallow rules; comments and unknown directives are ignored.
ROBOTS_AGENT_RE = r"(?i)^\s*user-agent\s*:\s*([^#\s]+)"
ROBOTS_RULE_RE = r"(?i)^\s*(allow|disallow)\s*:\s*([^#\s]*)"


def parse_robots(
    df: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies into a rules table — one row per
    ``(host, agent, rule, path_prefix, line_no)`` with ``rule`` in
    {'allow','disallow'} and ``agent`` lower-cased.

    Grouping is stateful across lines (a rule belongs to the most
    recent User-agent header above it; the rarer REP form where several
    consecutive User-agent headers share one rule block is out of scope
    — only the last header of a run binds); that state is a running
    ``last(..., ignorenulls)`` over a window partitioned by host and
    ordered by line position — one keyed exchange on the host, no
    Python. Rules before any User-agent header, comment lines, unknown
    directives, and empty-path Disallow lines ("Disallow:" = allow all,
    i.e. no rule) are dropped per the de-facto standard (REP,
    RFC 9309).

    Scale shape: robots bodies are small and one-per-host — the rules
    table is ~10^2 rows per host at worst and broadcastable against any
    page corpus.
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col).cast("string"), r"\n")).alias(
            "line_no", "_line"
        ),
    )
    agent = F.regexp_extract("_line", ROBOTS_AGENT_RE, 1)
    parsed = lines.select(
        "host",
        "line_no",
        F.when(agent != "", F.lower(agent)).alias("_agent_hdr"),
        F.lower(F.regexp_extract("_line", ROBOTS_RULE_RE, 1)).alias("_rule"),
        F.regexp_extract("_line", ROBOTS_RULE_RE, 2).alias("_path"),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = parsed.withColumn(
        "agent", F.last("_agent_hdr", ignorenulls=True).over(w)
    )
    return grouped.where(
        (F.col("_rule") != "")
        & (F.col("_path") != "")
        & F.col("agent").isNotNull()
    ).select(
        "host",
        "agent",
        F.col("_rule").alias("rule"),
        F.col("_path").alias("path_prefix"),
        "line_no",
    )


def url_path(url: Column) -> Column:
    """Path+query of an http(s) url ('/' when absent) — the string
    robots prefixes match against."""
    p = F.regexp_replace(url, r"^https?://[^/]+", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_allowed(
    pages: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    broadcast: bool = True,
) -> DataFrame:
    """Per-page crawl permission under a parsed robots rules table
    (:func:`parse_robots`), REP / RFC 9309 semantics:

    - the group matched is the MOST SPECIFIC one that applies — an
      exact ``agent`` group shadows the ``*`` group entirely (rules do
      not merge across groups);
    - within the group, the LONGEST matching path prefix wins;
    - on equal length, Allow wins;
    - no matching rule (or no robots.txt for the host) → allowed.

    Adds ``allowed`` (boolean) and ``matched_prefix`` (nullable); all
    input columns pass through untouched.

    Plan shape: rules collapse to ONE array row per host, so the
    right side is exactly one row per crawled host. With
    ``broadcast=True`` (default; correct up to ~10^6 hosts) pages
    broadcast-left-join that row — no fan-out, no shuffle of the page
    corpus, no window — and the longest-prefix winner is an
    `array_max` over a filtered struct array (lexicographic struct
    order = (prefix length, allow-beats-disallow)) inside the scan
    stage. At full web scale (10^8 hosts, rules in the GBs) pass
    ``broadcast=False``: a plain equi-join on host, one row per host
    on the build side; per-host page skew is the generic skew problem
    AQE's skew-join split handles, and bucketing both tables by host
    removes the shuffle entirely.
    """
    a = agent.lower()
    applicable = rules.where(F.col("agent").isin(a, "*"))
    # group selection: exact agent group shadows '*' — keep only rows
    # whose specificity equals the host's max specificity
    spec = F.when(F.col("agent") == a, F.lit(2)).otherwise(F.lit(1))
    ranked = applicable.withColumn("_spec", spec)
    host_max = ranked.groupBy("host").agg(F.max("_spec").alias("_maxspec"))
    group = (
        ranked.join(host_max, "host")
        .where(F.col("_spec") == F.col("_maxspec"))
        .select("host", "rule", "path_prefix")
    )
    per_host = group.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.length("path_prefix").alias("l"),
                (F.col("rule") == "allow").cast("int").alias("a"),
                F.col("rule").alias("rule"),
                F.col("path_prefix").alias("prefix"),
            )
        ).alias("_rules")
    ).withColumnRenamed("host", "_r_host")
    # internal columns must not collide with passthrough page columns
    # (a pages table may legitimately carry its own host column)
    for c in ("_host", "_path", "_r_host", "_rules"):
        if c in pages.columns:
            raise ValueError(f"pages already has internal column {c!r}")
    keep = list(pages.columns)
    keyed = pages.withColumn("_host", host_of(F.col(url_col))).withColumn(
        "_path", url_path(F.col(url_col))
    )
    rhs = F.broadcast(per_host) if broadcast else per_host
    joined = keyed.join(rhs, keyed["_host"] == per_host["_r_host"], "left")
    matched = F.filter(
        F.coalesce(
            "_rules",
            F.array().cast(
                "array<struct<l:int,a:int,rule:string,prefix:string>>"
            ),
        ),
        lambda r: F.col("_path").startswith(r["prefix"]),
    )
    win = F.array_max(matched)
    return joined.select(
        *keep,
        F.coalesce(win["rule"] == "allow", F.lit(True)).alias("allowed"),
        win["prefix"].alias("matched_prefix"),
    )


# Block-level tags that delimit text blocks for boilerplate removal
# (open OR close tag; inline tags like <a>/<b> stay inside the block).
# Same cross-engine regex subset; \b is an ASCII word boundary in both
# Java regex and RE2.
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|br|td|th|tr|ul|ol|table|section|article|"
    r"header|footer|nav|aside|blockquote)\b[^>]*>"
)
# Anchor inner text (capture 1) — the chars counted as "link text" by
# the density rule. Nested-markup anchors are skipped ([^<]*), same
# convention as ANCHOR_PATTERN.
ANCHOR_TEXT_RE = r"(?i)<a[^>]*>([^<]*)</a>"
_MC_TAG_RE = r"<[^>]*>"
_MC_WS_RE = r"\s+"


def main_content_cols(
    html: Column,
    min_words: int = 3,
    max_link_density_ppm: int = 300_000,
) -> dict[str, Column]:
    """Boilerplate removal / main-content extraction (the jusText /
    boilerpipe link-density heuristic, the stage every web-text corpus
    runs between fetch and quality filtering): split the page into
    block-level segments, strip tags per block, and KEEP blocks that
    have at least ``min_words`` words and whose anchor-text chars make
    up at most ``max_link_density_ppm`` of the block's clean text —
    navigation/footer chrome is short and link-saturated, body prose is
    neither.

    Pure JVM higher-order functions over one split of the html bytes
    (transform → filter → array_join): no Python, no shuffle, runs
    inside the scan stage at any corpus size. Link density uses integer
    ppm arithmetic (comparator-exact). Returns ``main_text`` (kept
    blocks joined by newline), ``n_blocks_kept``, ``n_blocks_total``
    (blocks with any text at all).
    """
    blocks = F.split(html.cast("string"), BLOCK_SPLIT_RE)

    def clean(b: Column) -> Column:
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(b, _MC_TAG_RE, " "), _MC_WS_RE, " "
            )
        )

    def link_chars(b: Column) -> Column:
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), F.lit(1)),
            F.lit(0),
            lambda acc, x: acc + F.length(F.trim(x)),
        )

    structs = F.transform(
        blocks, lambda b: F.struct(clean(b).alias("t"), link_chars(b).alias("lc"))
    )
    nonempty = F.filter(structs, lambda s: F.length(s["t"]) > 0)

    def words(t: Column) -> Column:
        return F.size(F.split(t, _MC_WS_RE))

    kept = F.filter(
        nonempty,
        lambda s: (words(s["t"]) >= min_words)
        & (
            s["lc"] * F.lit(1_000_000)
            <= F.lit(max_link_density_ppm) * F.length(s["t"])
        ),
    )
    return {
        "main_text": F.array_join(
            F.transform(kept, lambda s: s["t"]), "\n"
        ),
        "n_blocks_kept": F.size(kept).cast("long"),
        "n_blocks_total": F.size(nonempty).cast("long"),
    }


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    min_words: int = 3,
    max_link_density_ppm: int = 300_000,
) -> DataFrame:
    """DataFrame form of :func:`main_content_cols`: all columns except
    ``html_col`` pass through, plus main_text / n_blocks_kept /
    n_blocks_total."""
    keep = [c for c in df.columns if c != html_col]
    cols = main_content_cols(
        F.col(html_col), min_words, max_link_density_ppm
    )
    return df.select(*keep, *[c.alias(n) for n, c in cols.items()])


# URL-pattern quality gates (C4 §2.1 / RefinedWeb §3.1 url filtering):
# pages whose URL alone marks them as non-content — search/result pages,
# auth pages, media/asset files, parameter-stuffed links. Patterns are
# deliberately literal-alternation regexes that behave identically in
# Java regex (Spark) and RE2 (DuckDB oracle).
_URL_SEARCH_RE = r"[?&/](search|query|find|results?)([=/?&#]|$)"
_URL_AUTH_RE = r"/(login|log-in|signin|sign-in|signup|sign-up|register|account)([/?#]|$)"
_URL_ASSET_RE = (
    r"\.(jpg|jpeg|png|gif|webp|svg|ico|css|js|json|xml|pdf|zip|gz|tar"
    r"|mp3|mp4|avi|mov|woff2?)([?#]|$)"
)


def url_quality_cols(url: Column) -> dict[str, Column]:
    """Structural URL features + pattern gates, all scan-stage codegen
    expressions (zero shuffles, no UDF):

    - `path_depth` — '/' segments after the host (BIGINT)
    - `n_params` — query parameters (0 when no '?')
    - `flag_search` / `flag_auth` / `flag_asset` — pattern gates
    - `flag_long` — over-long URL (> 200 chars), the spam-link screen
    - `url_ok` — passes every gate (the C4-style keep decision)

    Lower-cased before matching so the gates are case-stable."""
    low = F.lower(url)
    path = F.regexp_extract(low, r"^[a-z]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(low, r"\?([^#]*)", 1)
    depth = (
        F.length(path) - F.length(F.regexp_replace(path, "/", ""))
    ).cast("long")
    n_params = F.when(F.length(query) == 0, F.lit(0).cast("long")).otherwise(
        (
            F.length(query)
            - F.length(F.regexp_replace(query, "&", ""))
            + 1
        ).cast("long")
    )
    flag_search = low.rlike(_URL_SEARCH_RE)
    flag_auth = low.rlike(_URL_AUTH_RE)
    flag_asset = low.rlike(_URL_ASSET_RE)
    flag_long = F.length(url) > 200
    return {
        "path_depth": depth,
        "n_params": n_params,
        "flag_search": flag_search,
        "flag_auth": flag_auth,
        "flag_asset": flag_asset,
        "flag_long": flag_long,
        "url_ok": ~(flag_search | flag_auth | flag_asset | flag_long),
    }
