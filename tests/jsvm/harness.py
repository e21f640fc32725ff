"""Page harness: load a dashboard HTML page + its scripts into jsvm and
drive it like a browser session (websocket messages, timers, keyboard).
"""

from __future__ import annotations

import json
import pathlib
from urllib.parse import parse_qs

from .browser import (
    Document, Element, FakeWebSocket, TextNode, Timers, Window, make_event,
    parse_fragment,
)
from .interp import (
    UNDEFINED, Interpreter, JSError, JSObject, JSPromise, NativeFunction,
    js_num, js_str,
)
from .jsparser import parse
from .runtime import _arg, json_to_js, native

STATIC_DIR = (pathlib.Path(__file__).resolve().parents[2]
              / "realtime_analytics_tpu" / "api" / "static")


class Page:
    """One loaded dashboard page.

    Usage:
        page = Page("index.html")
        page.open_ws()
        page.deliver_event({...})
        page.advance(1000)
        assert page.text("stat-streams") == "1"
    """

    def __init__(self, page_name: str, static_dir: pathlib.Path | None = None,
                 query: str = "", fetch_json: dict | None = None,
                 now_ms: float = 1766000000000.0):
        self.static_dir = pathlib.Path(static_dir or STATIC_DIR)
        self.query = query
        self.fetch_json = fetch_json or {}
        self.sockets: list[FakeWebSocket] = []
        self.fetches: list[str] = []

        self.interp = Interpreter()
        env = self.interp.globals
        self.clock = env.lookup("__clock_ms__")
        self.clock[0] = float(now_ms)
        self.timers = Timers(self.clock)

        html_text = (self.static_dir / page_name).read_text()
        self.document = Document()
        self._load_document(html_text)

        self._install_browser(env)
        self._run_scripts(html_text)

    # ------------------------------------------------------------ setup

    def _load_document(self, html_text: str):
        nodes = parse_fragment(html_text, self.document)

        def find(tag, roots):
            for n in roots:
                if isinstance(n, Element):
                    if n.tag == tag:
                        return n
                    found = find(tag, n.child_nodes)
                    if found is not None:
                        return found
            return None

        html_el = find("html", nodes)
        if html_el is not None:
            self.document.root = html_el
            body = find("body", [html_el])
            if body is not None:
                self.document.body = body
        else:
            for n in nodes:
                self.document.body.append_child(n)

    def _script_sources(self, html_text: str) -> list[str]:
        srcs = []

        def walk(node):
            for c in node.child_nodes:
                if isinstance(c, Element):
                    if c.tag == "script" and c.attrs.get("src"):
                        srcs.append(c.attrs["src"])
                    walk(c)

        walk(self.document.root)
        return srcs

    def _install_browser(self, env):
        page = self

        env.declare("document", self.document)

        location = JSObject()
        location.props["protocol"] = "http:"
        location.props["host"] = "localhost:8080"
        location.props["hostname"] = "localhost"
        location.props["search"] = self.query
        location.props["pathname"] = "/"
        env.declare("location", location)

        window = Window(env, extras={
            "innerWidth": 1280.0, "innerHeight": 800.0, "location": location,
        })
        env.declare("window", window)

        @native("WebSocket")
        def ws_ctor(interp, this, args):
            ws = FakeWebSocket(page, js_str(_arg(args, 0, "")))
            page.sockets.append(ws)
            return ws

        env.declare("WebSocket", ws_ctor)

        @native("fetch")
        def fetch_fn(interp, this, args):
            url = js_str(_arg(args, 0, ""))
            page.fetches.append(url)
            if url not in page.fetch_json:
                return JSPromise.reject(
                    json_to_js({"name": "TypeError", "message": "fetch failed"}))
            payload = page.fetch_json[url]
            resp = JSObject()
            resp.props["ok"] = True
            resp.props["status"] = 200.0

            @native("json")
            def json_method(i2, t2, a2):
                return JSPromise.resolve(json_to_js(payload))

            @native("text")
            def text_method(i2, t2, a2):
                return JSPromise.resolve(json.dumps(payload))

            resp.props["json"] = json_method
            resp.props["text"] = text_method
            return JSPromise.resolve(resp)

        env.declare("fetch", fetch_fn)

        @native("setTimeout")
        def set_timeout(interp, this, args):
            return float(page.timers.set(args[0], js_num(_arg(args, 1, 0.0)),
                                         interval=False))

        @native("setInterval")
        def set_interval(interp, this, args):
            return float(page.timers.set(args[0], js_num(_arg(args, 1, 0.0)),
                                         interval=True))

        @native("clearTimeout")
        def clear_timeout(interp, this, args):
            page.timers.clear(int(js_num(_arg(args, 0, -1.0))))
            return UNDEFINED

        env.declare("setTimeout", set_timeout)
        env.declare("setInterval", set_interval)
        env.declare("clearTimeout", clear_timeout)
        env.declare("clearInterval", clear_timeout)

        @native("requestAnimationFrame")
        def raf(interp, this, args):
            return float(page.timers.set(args[0], 16.0, interval=False))

        env.declare("requestAnimationFrame", raf)

        @native("URLSearchParams")
        def usp_ctor(interp, this, args):
            qs = js_str(_arg(args, 0, ""))
            parsed = parse_qs(qs.lstrip("?"))
            obj = JSObject()

            @native("get")
            def get_fn(i2, t2, a2):
                key = js_str(_arg(a2, 0, ""))
                vals = parsed.get(key)
                return vals[0] if vals else None

            @native("has")
            def has_fn(i2, t2, a2):
                return js_str(_arg(a2, 0, "")) in parsed

            obj.props["get"] = get_fn
            obj.props["has"] = has_fn
            return obj

        env.declare("URLSearchParams", usp_ctor)

        perf = JSObject()

        @native("now")
        def perf_now(interp, this, args):
            return page.clock[0]

        perf.props["now"] = perf_now
        env.declare("performance", perf)

    def _run_scripts(self, html_text: str):
        for src in self._script_sources(html_text):
            name = src.rsplit("/", 1)[-1]
            path = self.static_dir / name
            self.interp.run_script(path.read_text(), filename=name)

    # ------------------------------------------------------------ drive

    @property
    def ws(self) -> FakeWebSocket:
        if not self.sockets:
            raise AssertionError("page opened no websocket")
        return self.sockets[-1]

    def open_ws(self):
        self.ws.open()

    def deliver(self, message: dict):
        self.ws.deliver(json.dumps(message))

    def deliver_snapshot(self, events: list):
        self.deliver({"type": "snapshot", "payload": {"events": events}})

    def deliver_event(self, payload: dict):
        self.deliver({"type": "event", "payload": payload})

    def advance(self, ms: float):
        self.timers.advance(self.interp, ms)

    # ------------------------------------------------------------ inspect

    def by_id(self, ident: str) -> Element:
        el = self.document.get_element_by_id(ident)
        if el is None:
            raise AssertionError(f"no element #{ident}")
        return el

    def text(self, ident: str) -> str:
        return self.by_id(ident).text_content()

    def console(self) -> list:
        return list(self.interp.globals.lookup("__console_lines__"))

    def key(self, key: str, target: Element | None = None):
        target = target or self.document.body
        event = make_event(target, "keydown", key=key)
        self.document.fire(self.interp, "keydown", event)

    def set_input(self, ident: str, value: str):
        el = self.by_id(ident)
        el.props["value"] = value
        el.fire(self.interp, "input")

    def toggle_checkbox(self, ident: str):
        el = self.by_id(ident)
        el.props["checked"] = not bool(el.props.get("checked"))
        el.fire(self.interp, "change")

    def click(self, el: Element):
        el.fire(self.interp, "click")

    def canvas_ops(self, ident: str) -> list:
        el = self.by_id(ident)
        if el._ctx is None:
            return []
        return list(el._ctx.ops)
