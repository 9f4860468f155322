"""S5/S7 browser transports against IN-PROCESS protocol servers: the
transports speak the real public wire protocols (W3C WebDriver HTTP
JSON; Chrome DevTools JSON-RPC over RFC 6455 websocket), so a fake
server speaking the same protocol proves the client end-to-end without
a browser binary. Point the same transports at a real chromedriver /
Chrome --remote-debugging-port and nothing changes."""

from __future__ import annotations

import pyarrow as pa
import pytest

from web_crawler_ray.sources.browser import CdpTransport, SeleniumTransport
from web_crawler_ray.sources.fake_servers import (
    DEFAULT_PAGES as PAGES,
    start_cdp_server,
    start_webdriver_server,
)


@pytest.fixture()
def webdriver_server():
    srv, port = start_webdriver_server()
    srv.port = port
    yield srv
    srv.shutdown()


@pytest.fixture()
def cdp_server():
    http_srv, port, ws_sock = start_cdp_server()
    http_srv.port = port
    yield http_srv
    http_srv.shutdown()
    ws_sock.close()


def test_webdriver_transport_full_protocol(webdriver_server):
    tr = SeleniumTransport(port=webdriver_server.port, wait_for_css="#t",
                           scroll_times=2, poll_s=0.0)
    status, body = tr.get("http://x.test/a")
    assert (status, body.decode()) == (200, PAGES["http://x.test/a"])
    st = webdriver_server.state
    # session created with headless chrome caps; waited 3 polls; scrolled
    args = st["caps"]["capabilities"]["alwaysMatch"]["goog:chromeOptions"]["args"]
    assert "--headless" in args
    assert st["element_polls"] == 3
    assert st["scrolls"] == 2
    # session reused on the next fetch
    status2, body2 = tr.get("http://x.test/b")
    assert (status2, body2.decode()) == (200, PAGES["http://x.test/b"])
    tr.close()
    assert st.get("deleted") is True


def test_webdriver_transport_connection_refused():
    tr = SeleniumTransport(port=1)  # nothing listens
    assert tr.get("http://x.test/a") == (502, b"")


def test_cdp_transport_full_protocol(cdp_server):
    tr = CdpTransport(debug_port=cdp_server.port, load_timeout_s=5.0)
    assert tr.is_running()
    status, body = tr.get("http://x.test/a")
    assert (status, body.decode()) == (200, PAGES["http://x.test/a"])
    assert cdp_server.state["navigated"] == "http://x.test/a"
    assert cdp_server.state["closed"] == "tab-1"  # tab cleaned up
    # second fetch gets a fresh tab (per-fetch tab lifecycle, like the ref)
    status2, body2 = tr.get("http://x.test/b")
    assert (status2, body2.decode()) == (200, PAGES["http://x.test/b"])
    assert cdp_server.state["closed"] == "tab-2"


def test_cdp_transport_down_is_errors_as_data():
    tr = CdpTransport(debug_port=1)
    assert not tr.is_running()
    assert tr.get("http://x.test/a") == (502, b"")


def test_browser_transport_in_fetch_actor_pool(webdriver_server, ray_session):
    """The WebDriver transport plugs into the same FetcherActor pool as
    every other transport (S5 through the engine's actor protocol),
    driven through a real Ray map_batches."""
    import ray.data as rd

    from web_crawler_ray.sources.http_fetch import FetcherActor

    port = webdriver_server.port
    urls = rd.from_arrow(pa.table({"url": sorted(PAGES)}))
    out = urls.map_batches(
        FetcherActor,
        fn_constructor_kwargs={
            "transport_factory":
                lambda: SeleniumTransport(port=port, poll_s=0.0)},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas().sort_values("url").reset_index(drop=True)
    assert out["status"].tolist() == [200, 200]
    assert out["body"].tolist() == [PAGES[u].encode() for u in sorted(PAGES)]


def test_applescript_transport_against_fake_osascript():
    """S6: the transport builds the reference's AppleScript sequence
    (open location → resize → scroll×N → outerHTML) and parses runner
    output; FakeOsascript emulates scriptable Chrome."""
    from web_crawler_ray.sources.browser import AppleScriptTransport
    from web_crawler_ray.sources.fake_servers import FakeOsascript

    osa = FakeOsascript()
    tr = AppleScriptTransport(runner=osa, scroll_times=3)
    status, body = tr.get("http://x.test/a")
    assert (status, body.decode()) == (200, PAGES["http://x.test/a"])
    assert osa.current_url == "http://x.test/a"
    assert osa.scrolls == 3
    # exact command shapes the real osascript would receive
    assert osa.scripts[0] == (
        'tell application "Google Chrome" to open location '
        '"http://x.test/a"')
    assert "set bounds of front window" in osa.scripts[1]
    assert 'javascript "document.documentElement.outerHTML"' in osa.scripts[-1]


def test_applescript_transport_fails_fast_without_binary():
    from web_crawler_ray.sources.browser import AppleScriptTransport

    with pytest.raises(NotImplementedError):
        AppleScriptTransport()  # no osascript in this container


def test_applescript_runner_error_is_errors_as_data():
    from web_crawler_ray.sources.browser import AppleScriptTransport

    def broken(script, timeout_s):
        raise RuntimeError("(-600) application isn't running")

    tr = AppleScriptTransport(runner=broken)
    assert tr.get("http://x.test/a") == (502, b"")


def test_rpa_transport_keystroke_flow_with_page_reader():
    """S8: exact xdotool argv sequence (activate → ctrl+l → type →
    Return), page read via injected reader."""
    from web_crawler_ray.sources.browser import RpaTransport
    from web_crawler_ray.sources.fake_servers import FakeXdotool

    xdo = FakeXdotool()
    tr = RpaTransport(runner=xdo, page_reader=xdo.page_reader)
    status, body = tr.get("http://x.test/b")
    assert (status, body.decode()) == (200, PAGES["http://x.test/b"])
    assert xdo.argvs == [
        ["xdotool", "search", "--onlyvisible", "--class", "google-chrome",
         "windowactivate"],
        ["xdotool", "key", "ctrl+l"],
        ["xdotool", "type", "http://x.test/b"],
        ["xdotool", "key", "Return"],
    ]


def test_rpa_transport_devtools_read_through_cdp(cdp_server):
    """S8 full reference architecture: keystrokes navigate, the page
    comes back through a REAL CDP attach (GET /json tab list →
    websocket Runtime.evaluate) — fake keyboard and fake browser share
    desktop state."""
    from web_crawler_ray.sources.browser import CdpTransport, RpaTransport
    from web_crawler_ray.sources.fake_servers import FakeXdotool

    xdo = FakeXdotool(cdp_state=cdp_server.state)
    tr = RpaTransport(runner=xdo,
                      devtools=CdpTransport(debug_port=cdp_server.port,
                                            load_timeout_s=5.0))
    status, body = tr.get("http://x.test/a")
    assert (status, body.decode()) == (200, PAGES["http://x.test/a"])


def test_rpa_transport_fails_fast_without_binary():
    from web_crawler_ray.sources.browser import RpaTransport

    with pytest.raises(NotImplementedError):
        RpaTransport(page_reader=lambda: "")  # no xdotool here
