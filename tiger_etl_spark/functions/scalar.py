"""Scalar function library — SURVEY.md §2.8 (F1–F13), re-expressed as
JVM-side Column expressions (whole-stage-codegen'd; no Python).

Each function cites its reference analog (file:line in
/root/reference) so parity can be checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F2: email regex — reference pattern intent at
# modules/.../user_management_constants.py:20, validator at
# modules/security_management/passwords.py:26-31.
EMAIL_PATTERN = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"

# F12: dotted-quad IPv4 (validations.py:104-114 used ipaddress.ip_address).
IPV4_PATTERN = (
    r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
)


def hash_password(col: Column) -> Column:
    """F1 — SHA-256 hex digest (passwords.py:22-23)."""
    return F.sha2(col, 256)


def validate_email_format(col: Column) -> Column:
    """F2 — boolean email-syntax check (passwords.py:26-31)."""
    return col.rlike(EMAIL_PATTERN)


def validate_password_strength(col: Column) -> Column:
    """F3 — length≥8 + upper + lower + digit + special
    (passwords.py:34-44; patterns user_management_constants.py:24-27)."""
    return (
        (F.length(col) >= 8)
        & col.rlike(r"[A-Z]")
        & col.rlike(r"[a-z]")
        & col.rlike(r"[0-9]")
        & col.rlike(r"[^A-Za-z0-9]")
    )


def normalize(col: Column) -> Column:
    """F4 — case-fold + trim before compare (auth.py:47,80)."""
    return F.lower(F.trim(col))


def deterministic_row_id(key: Column, seq: Column) -> Column:
    """F5 — the reference makes ``f"{prefix}-{uuid4().hex}"`` session ids
    (sessions_management.py:897-909); the CDC engine derives
    **deterministic** ids from (key, op_seq) for replayability."""
    return F.md5(F.concat_ws("\x1f", key, seq.cast("string")))


def duration_seconds(end_ts: Column, start_ts: Column) -> Column:
    """F6 — timestamp subtraction → integer seconds
    (sessions_management/model.py:196-200)."""
    return (F.unix_timestamp(end_ts) - F.unix_timestamp(start_ts)).cast("long")


def iso_format(ts: Column) -> Column:
    """F9 — ISO-8601 serialization (model.py:263-278 .isoformat())."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ssXXX")


def extract_device_info(user_agent: Column) -> Column:
    """F10 — substring-match OS classifier over user_agent
    (session_manager.py:208-247), as a codegen'd CASE chain."""
    ua = F.coalesce(user_agent, F.lit(""))
    return (
        F.when(ua.contains("Windows NT 10.0"), "Windows 10")
        .when(ua.contains("Windows"), "Windows")
        .when(ua.contains("Mac OS X"), "macOS")
        .when(ua.contains("Android"), "Android")
        .when(ua.contains("iPhone") | ua.contains("iPad"), "iOS")
        .when(ua.contains("Linux"), "Linux")
        .otherwise("Unknown")
    )


def client_ip(forwarded_for: Column, real_ip: Column, host: Column) -> Column:
    """F11 — header-precedence client IP: first of the x-forwarded-for
    chain, then x-real-ip, then direct host (session_manager.py:185-206)."""
    first_fwd = F.when(
        forwarded_for.isNotNull() & (F.length(F.trim(forwarded_for)) > 0),
        F.trim(F.split(forwarded_for, ",")[0]),
    )
    return F.coalesce(first_fwd, real_ip, host)


def valid_ipv4(col: Column) -> Column:
    """F12 — IP format validation (validations.py:104-114)."""
    return col.rlike(IPV4_PATTERN)


def coerce_positive_long(col: Column) -> Column:
    """F13 — str→int coercion + positive check
    (user_group_management.py:151-178); invalid → NULL (router sends
    NULLs to quarantine — Spark can't raise per-row). try_cast, not
    cast: under ANSI mode (the Spark 4 default) a plain cast THROWS on
    the first malformed string, killing the whole job instead of
    quarantining the row."""
    c = col.try_cast("long")
    return F.when(c > 0, c)


# Tracking query params stripped by canonicalize_url (crawl-dedup
# convention; extend per deployment).
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid")


def canonicalize_url(url: Column) -> Column:
    """Canonical URL for dedup-by-url at crawl ingest: lowercase
    scheme+host, strip the scheme's default port (http:80 / https:443;
    non-default ports are a different origin and survive), strip the
    fragment,
    drop tracking query params (utm_* etc), sort the surviving params,
    and strip one trailing slash from a non-root path. Two crawls of
    `HTTP://Ex.com/a?utm_x=1&b=2#f` and `http://ex.com/a?b=2` then
    share one merge key. All JVM-side (`parse_url` + array functions —
    whole-stage codegen, no Python); malformed URLs fall back to the
    trimmed input rather than null so no row loses its key."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    # parse_url HOST never carries the port; take it from AUTHORITY so
    # a NON-default port survives into the key (ex.com:8080 is a
    # different origin than ex.com!) and only the scheme's own default
    # port is stripped (https://ex.com:80 is not default)
    auth = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    auth = F.element_at(F.split(auth, "@"), -1)  # drop userinfo
    default_port = (
        F.when(scheme == "http", F.lit(":80"))
        .when(scheme == "https", F.lit(":443"))
        .otherwise(F.lit("\x00never"))
    )
    hostport = F.when(
        auth.endswith(default_port),
        F.substring(auth, F.lit(1), F.length(auth) - F.length(default_port)),
    ).otherwise(auth)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.substring(path, 1, F.length(path) - 1),
        ).otherwise(path)
    )
    query = F.try_parse_url(url, F.lit("QUERY"))
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "")
        & ~F.exists(
            F.array(*[F.lit(t) for t in TRACKING_PARAM_PREFIXES]),
            lambda t: p.startswith(t),
        ),
    )
    qnorm = F.array_join(F.array_sort(kept), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
    return F.when(
        scheme.isNotNull() & host.isNotNull(), rebuilt
    ).otherwise(F.trim(url))


def guarded_positions(n: Column, start: int = 1) -> Column:
    """``sequence(start, n)`` that is EMPTY when ``n < start``.

    Spark's ``sequence(a, b)`` steps DOWNWARD when ``b < a`` — a short
    document would yield ``[1, 0]`` and feed ``slice``/``substring`` an
    invalid 0 index. Every rolling-window operator (shingles, n-grams,
    char bigrams, chunking) needs this guard; keep it in ONE place so a
    new call site cannot mis-port it."""
    return F.when(
        n < start, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(start), F.greatest(n, F.lit(start))))
