"""Connect-time SSRF guard for production live fetch.

The reference's live fetcher (engines/utils/safeFetch.ts) enforces TWO
layers: a hostname policy before DNS, and a check of the socket's
resolved remote address at connect time — because DNS can map a clean
name to a private IP, and a rebinding resolver can answer differently
between "check" and "connect". This module is the PySpark-side twin:

1. name check — :func:`~webcrawl_spark.kernels.classify.is_unsafe_host`
   before any resolution (loopback/localhost names, .local/.internal,
   non-global literal IPs incl. inet_aton decimal/hex/octal forms);
2. resolve-then-dial-the-vetted-IP — ``getaddrinfo`` once, classify
   EVERY resolved address with the same policy, then open the TCP
   connection to the vetted IP itself (the Host header and TLS SNI
   carry the original name). The classic DNS-rebind TOCTOU — resolve
   clean, re-resolve dirty inside the HTTP client — cannot occur
   because no second resolution ever happens.

Redirects are followed manually (default ≤ 5 hops) and every hop
re-passes both layers, so a safe host 302-ing to
``http://169.254.169.254/`` is refused at the hop, like the reference.

Everything is dependency-injectable (``getaddrinfo``, ``unsafe``) so the
guard is fully testable offline; the crawl engine's pre-dial split
(frontier/crawl.py `_live_fetch`) remains the first line — this module
is the defense-in-depth a production ``fetch_udf`` composes.
"""

from __future__ import annotations

import http.client
import socket
import ssl
from urllib.parse import urljoin, urlsplit

import pandas as pd

from .classify import is_unsafe_host

__all__ = [
    "UnsafeAddressError",
    "resolve_safe",
    "safe_fetch",
    "make_safe_fetch_udf",
]

DEFAULT_MAX_BYTES = 10 * 2**20
DEFAULT_USER_AGENT = "webcrawl-spark/1.0"


class UnsafeAddressError(ValueError):
    """Refused by the SSRF policy: the host name itself, or an address
    it resolves to, is not globally routable."""

    def __init__(self, host: str, address: str):
        super().__init__(f"unsafe address for host {host!r}: {address}")
        self.host = host
        self.address = address


def resolve_safe(
    host: str,
    port: int = 80,
    *,
    getaddrinfo=socket.getaddrinfo,
    unsafe=is_unsafe_host,
) -> list[str]:
    """Resolve ``host`` once and vet every answer. Returns the resolved
    addresses (dial order) iff ALL are globally routable; raises
    :class:`UnsafeAddressError` on the first unsafe answer — a resolver
    that mixes one private IP into the answer set taints the whole host
    (any answer may be the one the OS would dial)."""
    if unsafe(host):
        raise UnsafeAddressError(host, host)
    try:
        infos = getaddrinfo(host, port, type=socket.SOCK_STREAM)
    except OSError as e:
        raise UnsafeAddressError(host, f"<unresolvable: {e}>") from e
    addrs: list[str] = []
    for _family, _type, _proto, _canon, sockaddr in infos:
        ip = sockaddr[0]
        if ip not in addrs:
            addrs.append(ip)
    if not addrs:
        raise UnsafeAddressError(host, "<no addresses>")
    for ip in addrs:
        if unsafe(ip):
            raise UnsafeAddressError(host, ip)
    return addrs


class _PinnedHTTPSConnection(http.client.HTTPSConnection):
    """HTTPS to a pre-vetted IP with SNI/verification against the
    original host name (dial the IP, certify the name)."""

    def __init__(self, ip: str, server_hostname: str, port: int,
                 timeout: float, context: ssl.SSLContext):
        super().__init__(ip, port, timeout=timeout, context=context)
        self._pinned_context = context
        self._server_hostname = server_hostname

    def connect(self):  # noqa: D102 — http.client override
        sock = socket.create_connection(
            (self.host, self.port), self.timeout)
        self.sock = self._pinned_context.wrap_socket(
            sock, server_hostname=self._server_hostname)


def safe_fetch(
    url: str,
    *,
    timeout: float = 10.0,
    max_bytes: int = DEFAULT_MAX_BYTES,
    max_redirects: int = 5,
    user_agent: str = DEFAULT_USER_AGENT,
    getaddrinfo=socket.getaddrinfo,
    unsafe=is_unsafe_host,
    ssl_context: ssl.SSLContext | None = None,
) -> tuple[int, str, bytes]:
    """GET ``url`` with both SSRF layers enforced on every hop.

    → (status, final_url, body[:max_bytes]). Raises
    :class:`UnsafeAddressError` when any hop's name or resolved address
    is refused, ``ValueError`` for non-http(s) schemes, and propagates
    socket/TLS errors — callers (e.g. the pandas UDF below) map these to
    null rows, mirroring the engine's status taxonomy."""
    current = url
    for _hop in range(max_redirects + 1):
        parts = urlsplit(current)
        if parts.scheme not in ("http", "https"):
            raise ValueError(f"unsupported scheme: {parts.scheme!r}")
        host = parts.hostname or ""
        port = parts.port or (443 if parts.scheme == "https" else 80)
        addrs = resolve_safe(host, port, getaddrinfo=getaddrinfo,
                             unsafe=unsafe)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        default_port = 443 if parts.scheme == "https" else 80
        host_hdr = host if port == default_port else f"{host}:{port}"
        # try every vetted address in resolver order (AAAA-first answers
        # on a v4-only executor would otherwise fail the whole fetch)
        last_err: OSError | None = None
        redirected = None
        for ip in addrs:
            if parts.scheme == "https":
                ctx = ssl_context or ssl.create_default_context()
                conn: http.client.HTTPConnection = _PinnedHTTPSConnection(
                    ip, host, port, timeout, ctx)
            else:
                conn = http.client.HTTPConnection(ip, port, timeout=timeout)
            try:
                conn.request("GET", path, headers={
                    "Host": host_hdr,
                    "User-Agent": user_agent,
                    "Accept-Encoding": "identity",
                    "Connection": "close",
                })
                resp = conn.getresponse()
                loc = resp.getheader("Location") \
                    if resp.status in (301, 302, 303, 307, 308) else None
                if loc is None:
                    return resp.status, current, resp.read(max_bytes)
                redirected = urljoin(current, loc)
            except OSError as e:
                last_err = e
                continue
            finally:
                conn.close()
            break                             # redirect: leave address loop
        else:
            raise last_err if last_err is not None else \
                UnsafeAddressError(host, "<no dialable address>")
        current = redirected                  # re-enter hop loop
    raise UnsafeAddressError(urlsplit(url).hostname or "",
                             f"<too many redirects (> {max_redirects})>")


def make_safe_fetch_udf(
    timeout: float = 10.0,
    max_bytes: int = DEFAULT_MAX_BYTES,
    user_agent: str = DEFAULT_USER_AGENT,
    getaddrinfo=socket.getaddrinfo,
    unsafe=is_unsafe_host,
):
    """A production ``fetch_udf`` for SparkCrawl live mode: url → binary
    body for 2xx, null otherwise (refused/unsafe/error rows become null,
    which the engine records with its status taxonomy). One Arrow batch
    per partition; failures never raise out of the task."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def fetch(urls: pd.Series) -> pd.Series:
        out = []
        for u in urls:
            try:
                status, _final, body = safe_fetch(
                    u, timeout=timeout, max_bytes=max_bytes,
                    user_agent=user_agent, getaddrinfo=getaddrinfo,
                    unsafe=unsafe)
                out.append(body if 200 <= status < 300 else None)
            except (UnsafeAddressError, ValueError, OSError,
                    http.client.HTTPException):
                out.append(None)
        return pd.Series(out, dtype=object)

    return fetch
