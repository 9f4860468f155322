"""Browser-driven fetch backends (SURVEY.md §2.1 S5-S8) — interface
stubs.

The reference drives real browsers four ways: Selenium headless Chrome
(pacong/browser/selenium_controller.py:68-124), AppleScript-automated
Chrome (browser/applescript.py:64-152), the Chrome DevTools protocol
over websocket (browser/cdp.py:30-189), and cross-platform RPA
keystroke automation (browser/rpa_chrome_controller.py:386-556). None
of those can run in this sandbox (no browser binaries, no display, no
network), so the engine exposes the ACTOR INTERFACE those backends plug
into — identical to ``http_fetch.FetcherActor``'s transport protocol —
and raises clearly when instantiated. The Ray-side shape (actor pool,
one browser process per actor created in ``__init__``, small
``max_tasks_in_flight``) is documented here and exercised via
``FakeTransport`` in tests.
"""

from __future__ import annotations


class _UnavailableBrowserTransport:
    """Base for browser transports: same ``get(url) -> (status, body)``
    protocol as http_fetch transports; constructing one without the
    backing binary raises immediately (actor __init__ fails fast)."""

    REQUIRES: str = "a browser"

    def __init__(self, *_a, **_kw):
        raise NotImplementedError(
            f"{type(self).__name__} needs {self.REQUIRES}, which is not "
            "available in this container. Use http_fetch.FetcherActor with "
            "RequestsTransport (network) or FakeTransport (offline); any "
            "object with get(url)->(status, body) plugs into the same "
            "actor pool."
        )


class SeleniumTransport(_UnavailableBrowserTransport):
    """S5 — headless Chrome via Selenium: wait-for-element + scroll-N
    then page_source (selenium_controller.py:68-124, :207-239)."""

    REQUIRES = "selenium + a Chrome/chromedriver binary"


class CdpTransport(_UnavailableBrowserTransport):
    """S7 — Chrome DevTools protocol: launch with --remote-debugging-port,
    Page.navigate + Runtime.evaluate over websocket (cdp.py:30-189)."""

    REQUIRES = "a Chrome binary + websocket access"


class AppleScriptTransport(_UnavailableBrowserTransport):
    """S6 — macOS Chrome via osascript: open, resize, scroll, grab
    outerHTML (applescript.py:64-152)."""

    REQUIRES = "macOS with scriptable Chrome"


class RpaTransport(_UnavailableBrowserTransport):
    """S8 — OS-level keystroke automation + DevTools JS eval
    (rpa_chrome_controller.py:386-556)."""

    REQUIRES = "a desktop session (pyautogui/xdotool)"
