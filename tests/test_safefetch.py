"""Connect-time SSRF guard (kernels/safefetch.py) — resolved-IP policy,
dial-the-vetted-IP rebind immunity, per-hop redirect re-guarding.

Reference parity: engines/utils/safeFetch.ts checks the socket's
resolved remote address at connect time; here the vetted address IS the
dialed address, so the check cannot be raced. All tests run offline via
injected getaddrinfo / a loopback http.server.
"""
from __future__ import annotations

import socket
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from webcrawl_spark.kernels.safefetch import (
    UnsafeAddressError,
    resolve_safe,
    safe_fetch,
)


def _gai(*ips):
    """Fake getaddrinfo answering with the given IPs (call-counted)."""
    calls = []

    def getaddrinfo(host, port, **kw):
        calls.append(host)
        return [(socket.AF_INET, socket.SOCK_STREAM, 6, "", (ip, port))
                for ip in ips]

    getaddrinfo.calls = calls
    return getaddrinfo


class TestResolveSafe:
    def test_public_answers_pass_in_order(self):
        gai = _gai("93.184.216.34", "93.184.216.35")
        assert resolve_safe("example.com", getaddrinfo=gai) == [
            "93.184.216.34", "93.184.216.35"]

    @pytest.mark.parametrize("ip", [
        "127.0.0.1", "10.1.2.3", "192.168.0.9", "169.254.169.254",
        "100.64.0.1", "::1", "fe80::1", "0.0.0.0",
    ])
    def test_private_answer_refused(self, ip):
        with pytest.raises(UnsafeAddressError) as e:
            resolve_safe("clean-name.example", getaddrinfo=_gai(ip))
        assert e.value.address == ip

    def test_one_dirty_answer_taints_all(self):
        gai = _gai("93.184.216.34", "10.0.0.5")
        with pytest.raises(UnsafeAddressError) as e:
            resolve_safe("mixed.example", getaddrinfo=gai)
        assert e.value.address == "10.0.0.5"

    def test_unsafe_name_refused_before_dns(self):
        gai = _gai("93.184.216.34")
        with pytest.raises(UnsafeAddressError):
            resolve_safe("localhost", getaddrinfo=gai)
        with pytest.raises(UnsafeAddressError):
            resolve_safe("2130706433", getaddrinfo=gai)  # inet_aton form
        assert gai.calls == []          # never resolved

    def test_unresolvable_refused(self):
        def boom(host, port, **kw):
            raise socket.gaierror("NXDOMAIN")

        with pytest.raises(UnsafeAddressError):
            resolve_safe("nx.example", getaddrinfo=boom)


class _Handler(BaseHTTPRequestHandler):
    seen: list[tuple[str, str]] = []

    def do_GET(self):                   # noqa: N802 — http.server API
        type(self).seen.append((self.path, self.headers.get("Host", "")))
        if self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/final")
            self.end_headers()
        elif self.path == "/to-metadata":
            self.send_response(302)
            self.send_header("Location", "http://169.254.169.254/iam")
            self.end_headers()
        else:
            body = f"hello from {self.path}".encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    def log_message(self, *a):          # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _loopback_ok(h: str) -> bool:
    """Test policy: everything allowed (the server lives on loopback)."""
    return False


class TestSafeFetch:
    def test_dials_vetted_ip_sends_real_host(self, server):
        _Handler.seen.clear()
        port = server.server_address[1]
        status, final, body = safe_fetch(
            f"http://site.example:{port}/page",
            getaddrinfo=_gai("127.0.0.1"), unsafe=_loopback_ok)
        assert status == 200 and body == b"hello from /page"
        # Host header carries the NAME (with port), not the dialed IP
        assert _Handler.seen == [("/page", f"site.example:{port}")]

    def test_single_resolution_no_rebind_window(self, server):
        port = server.server_address[1]
        gai = _gai("127.0.0.1")
        safe_fetch(f"http://site.example:{port}/x",
                   getaddrinfo=gai, unsafe=_loopback_ok)
        # one hop → exactly one resolution; the dialed socket goes to the
        # vetted answer, so a rebinding resolver has no second query to
        # poison.
        assert gai.calls == ["site.example"]

    def test_redirect_followed_and_reguarded(self, server):
        _Handler.seen.clear()
        port = server.server_address[1]
        checked = []

        def policy(h):
            checked.append(h)
            return False

        status, final, body = safe_fetch(
            f"http://site.example:{port}/redir",
            getaddrinfo=_gai("127.0.0.1"), unsafe=policy)
        assert status == 200 and body == b"hello from /final"
        assert final.endswith("/final")
        # both hops vetted: name + resolved IP each time
        assert checked == ["site.example", "127.0.0.1"] * 2

    def test_redirect_to_metadata_ip_refused(self, server):
        port = server.server_address[1]

        def policy(h):                  # real classifier, loopback allowed
            from webcrawl_spark.kernels.classify import is_unsafe_host
            return h != "127.0.0.1" and h != "site.example" \
                and is_unsafe_host(h)

        with pytest.raises(UnsafeAddressError) as e:
            safe_fetch(f"http://site.example:{port}/to-metadata",
                       getaddrinfo=_gai("127.0.0.1"), unsafe=policy)
        assert e.value.address == "169.254.169.254"

    def test_max_bytes_truncates(self, server):
        port = server.server_address[1]
        _, _, body = safe_fetch(
            f"http://site.example:{port}/longer-path-name",
            max_bytes=5, getaddrinfo=_gai("127.0.0.1"),
            unsafe=_loopback_ok)
        assert body == b"hello"

    def test_non_http_scheme_rejected(self):
        with pytest.raises(ValueError):
            safe_fetch("ftp://example.com/x", getaddrinfo=_gai("1.2.3.4"))

    def test_default_policy_refuses_loopback_resolution(self, server):
        port = server.server_address[1]
        with pytest.raises(UnsafeAddressError):
            safe_fetch(f"http://site.example:{port}/page",
                       getaddrinfo=_gai("127.0.0.1"))   # default unsafe=


class TestSafeFetchUdf:
    def test_udf_fetches_and_nulls_failures(self, spark, server):
        from webcrawl_spark.kernels.safefetch import make_safe_fetch_udf

        port = server.server_address[1]
        # nested defs pickle by value (cloudpickle) into the workers
        udf = make_safe_fetch_udf(
            getaddrinfo=lambda host, p, **kw: [
                (socket.AF_INET, socket.SOCK_STREAM, 6, "",
                 ("127.0.0.1", p))],
            unsafe=lambda h: False)
        df = spark.createDataFrame(
            [(f"http://site.example:{port}/a",),
             (f"http://site.example:{port}/b",),
             ("ftp://bad.scheme/x",)], "url string")
        rows = {r["url"]: r["body"] for r in
                df.select("url", udf("url").alias("body")).collect()}
        assert rows[f"http://site.example:{port}/a"] == b"hello from /a"
        assert rows[f"http://site.example:{port}/b"] == b"hello from /b"
        assert rows["ftp://bad.scheme/x"] is None


class TestAddressFallback:
    def test_falls_back_to_next_vetted_address(self, server):
        # first answer refuses the connection (closed port on 127.0.0.2),
        # the second is the live server — fetch must succeed on addrs[1]
        port = server.server_address[1]
        status, _final, body = safe_fetch(
            f"http://site.example:{port}/fb",
            getaddrinfo=_gai("127.0.0.2", "127.0.0.1"),
            unsafe=_loopback_ok, timeout=2.0)
        assert status == 200 and body == b"hello from /fb"

    def test_all_addresses_dead_raises_oserror(self):
        with pytest.raises(OSError):
            safe_fetch("http://site.example:1/x",
                       getaddrinfo=_gai("127.0.0.2"),
                       unsafe=_loopback_ok, timeout=1.0)
