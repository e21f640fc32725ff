"""Browser environment stub for jsvm: DOM with a real HTML parser,
document/window/location, WebSocket + fetch fakes, virtual timers.

The DOM is deliberately faithful where the frontend depends on it:
``innerHTML = markup`` parses the markup (html.parser) so a subsequent
``querySelectorAll("tr")`` / ``tr.dataset.stream`` works over generated
rows, exactly the pattern main.js uses for the stream table.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

from .interp import (
    CALLABLE, UNDEFINED, JSArray, JSError, JSObject, JSPromise,
    NativeFunction, js_num, js_str, make_error, throw_type_error,
)
from .runtime import _arg, json_to_js, native

VOID_TAGS = {"br", "img", "input", "hr", "meta", "link", "source", "col",
             "area", "base", "embed", "param", "track", "wbr"}

_INPUT_DEFAULTS = {"value": "", "checked": False}


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str):
        self.text = text
        self.parent = None


class StyleObject:
    def __init__(self):
        self.decls: dict = {}

    def js_get(self, name: str):
        return self.decls.get(name, "")

    def js_set(self, name: str, value):
        self.decls[name] = js_str(value)


class Dataset:
    def __init__(self, element: "Element"):
        self._el = element

    def js_get(self, name: str):
        attr = "data-" + _camel_to_kebab(name)
        v = self._el.attrs.get(attr)
        return v if v is not None else UNDEFINED

    def js_set(self, name: str, value):
        self._el.attrs["data-" + _camel_to_kebab(name)] = js_str(value)


def _camel_to_kebab(s: str) -> str:
    out = []
    for c in s:
        if c.isupper():
            out.append("-" + c.lower())
        else:
            out.append(c)
    return "".join(out)


class Canvas2D:
    """Recording 2D context: every method call is appended to .ops."""

    def __init__(self, element):
        self.element = element
        self.ops: list = []
        self.attrs: dict = {}

    def js_get(self, name: str):
        if name in self.attrs:
            return self.attrs[name]
        if name == "canvas":
            return self.element

        ctx = self

        @native(name)
        def method(interp, this, args):
            if name == "measureText":
                o = JSObject()
                o.props["width"] = 6.0 * len(js_str(_arg(args, 0, "")))
                return o
            if name == "createLinearGradient":
                grad = JSObject()
                stops = JSArray([])

                @native("addColorStop")
                def add_stop(i2, t2, a2):
                    stops.items.append(JSArray([_arg(a2, 0), _arg(a2, 1)]))
                    return UNDEFINED

                grad.props["addColorStop"] = add_stop
                grad.props["stops"] = stops
                return grad
            ctx.ops.append((name, tuple(js_str(a) if isinstance(a, str) else a
                                        for a in args)))
            return UNDEFINED

        return method

    def js_set(self, name: str, value):
        self.attrs[name] = value


class Element:
    def __init__(self, tag: str, document: "Document"):
        self.tag = tag.lower()
        self.document = document
        self.attrs: dict = {}
        self.child_nodes: list = []
        self.parent: Element | None = None
        self.listeners: dict = {}     # type -> [fn]
        self.props: dict = {}         # JS-set expando + element properties
        self.style = StyleObject()
        self._ctx: Canvas2D | None = None
        if tag.lower() == "input":
            self.props.update(_INPUT_DEFAULTS)
        if tag.lower() == "canvas":
            self.props.setdefault("width", 300.0)
            self.props.setdefault("height", 150.0)

    # ---- tree ops ----

    def _adopt(self, node):
        if isinstance(node, Element) and node.parent is not None:
            node.parent.child_nodes.remove(node)
        node.parent = self

    def append_child(self, node):
        self._adopt(node)
        self.child_nodes.append(node)
        return node

    def element_children(self) -> list:
        return [c for c in self.child_nodes if isinstance(c, Element)]

    def text_content(self) -> str:
        out = []

        def walk(node):
            for c in node.child_nodes:
                if isinstance(c, TextNode):
                    out.append(c.text)
                else:
                    walk(c)

        walk(self)
        return "".join(out)

    def serialize_inner(self) -> str:
        return "".join(_serialize(c) for c in self.child_nodes)

    def set_inner_html(self, markup: str):
        self.child_nodes = []
        for node in parse_fragment(markup, self.document):
            self.append_child(node)

    # ---- selectors ----

    def matches(self, sel: str) -> bool:
        sel = sel.strip()
        if sel.startswith("#"):
            return self.attrs.get("id") == sel[1:]
        tag = None
        classes = []
        buf = ""
        mode = "tag"
        for c in sel + "\0":
            if c in ".\0":
                if mode == "tag" and buf:
                    tag = buf
                elif mode == "class" and buf:
                    classes.append(buf)
                buf = ""
                mode = "class"
            else:
                buf += c
        if tag and self.tag != tag.lower():
            return False
        el_classes = (self.attrs.get("class") or "").split()
        return all(c in el_classes for c in classes)

    def query_all(self, sel: str) -> list:
        out = []

        def walk(node):
            for c in node.child_nodes:
                if isinstance(c, Element):
                    if c.matches(sel):
                        out.append(c)
                    walk(c)

        walk(self)
        return out

    # ---- events ----

    def add_listener(self, typ: str, fn):
        self.listeners.setdefault(typ, []).append(fn)

    def fire(self, interp, typ: str, event=None):
        event = event if event is not None else make_event(self, typ)
        handler = self.props.get("on" + typ)
        if isinstance(handler, CALLABLE):
            interp.call(handler, self, [event])
        for fn in list(self.listeners.get(typ, [])):
            interp.call(fn, self, [event])

    # ---- JS property surface ----

    def js_get(self, name: str):
        el = self
        if name == "id":
            return self.attrs.get("id", "")
        if name == "tagName":
            return self.tag.upper()
        if name == "className":
            return self.attrs.get("class", "")
        if name == "textContent":
            return self.text_content()
        if name == "innerHTML":
            return self.serialize_inner()
        if name == "style":
            return self.style
        if name == "dataset":
            return Dataset(self)
        if name == "title":
            return self.attrs.get("title", self.props.get("title", ""))
        if name == "children":
            return JSArray(self.element_children())
        if name == "childNodes":
            return JSArray(list(self.child_nodes))
        if name == "firstChild":
            return self.child_nodes[0] if self.child_nodes else None
        if name == "lastChild":
            return self.child_nodes[-1] if self.child_nodes else None
        if name == "parentNode" or name == "parentElement":
            return self.parent if self.parent is not None else None
        if name in self.props:
            return self.props[name]
        if name in ("width", "height") and self.tag == "canvas":
            return self.props.get(name, 0.0)

        method_names = {
            "appendChild", "removeChild", "append", "prepend", "remove",
            "querySelector", "querySelectorAll", "getContext",
            "addEventListener", "removeEventListener",
            "getBoundingClientRect", "setAttribute", "getAttribute",
            "click", "focus", "blur", "contains",
        }
        if name not in method_names:
            if name.startswith("on"):
                return None  # unset handler reads as null
            attr_val = self.attrs.get(name)
            return attr_val if attr_val is not None else UNDEFINED

        @native(name)
        def method(interp, this, args):
            if name == "appendChild":
                return el.append_child(args[0])
            if name == "removeChild":
                node = args[0]
                if node not in el.child_nodes:
                    throw_type_error("removeChild: node is not a child")
                el.child_nodes.remove(node)
                node.parent = None
                return node
            if name == "append":
                for a in args:
                    if isinstance(a, str):
                        el.append_child(TextNode(a))
                    else:
                        el.append_child(a)
                return UNDEFINED
            if name == "prepend":
                for a in reversed(args):
                    node = TextNode(a) if isinstance(a, str) else a
                    el._adopt(node)
                    el.child_nodes.insert(0, node)
                return UNDEFINED
            if name == "remove":
                if el.parent is not None:
                    el.parent.child_nodes.remove(el)
                    el.parent = None
                return UNDEFINED
            if name == "querySelector":
                found = el.query_all(js_str(args[0]))
                return found[0] if found else None
            if name == "querySelectorAll":
                return JSArray(el.query_all(js_str(args[0])))
            if name == "getContext":
                if el._ctx is None:
                    el._ctx = Canvas2D(el)
                return el._ctx
            if name == "addEventListener":
                el.add_listener(js_str(args[0]), args[1])
                return UNDEFINED
            if name == "removeEventListener":
                fns = el.listeners.get(js_str(args[0]), [])
                if args[1] in fns:
                    fns.remove(args[1])
                return UNDEFINED
            if name == "getBoundingClientRect":
                o = JSObject()
                o.props.update(left=0.0, top=0.0, x=0.0, y=0.0,
                               width=js_num(el.props.get("width", 100.0)),
                               height=js_num(el.props.get("height", 50.0)),
                               right=js_num(el.props.get("width", 100.0)),
                               bottom=js_num(el.props.get("height", 50.0)))
                return o
            if name == "setAttribute":
                el.attrs[js_str(args[0])] = js_str(args[1])
                return UNDEFINED
            if name == "getAttribute":
                v = el.attrs.get(js_str(args[0]))
                return v if v is not None else None
            if name == "click":
                el.fire(interp, "click")
                return UNDEFINED
            if name in ("focus", "blur"):
                return UNDEFINED
            if name == "contains":
                node = args[0]
                while isinstance(node, (Element, TextNode)):
                    if node is el:
                        return True
                    node = node.parent
                return False
            raise AssertionError(name)

        return method

    def js_set(self, name: str, value):
        if name == "id":
            self.attrs["id"] = js_str(value)
        elif name == "className":
            self.attrs["class"] = js_str(value)
        elif name == "textContent":
            self.child_nodes = [TextNode(js_str(value))] if js_str(value) else []
        elif name == "innerHTML":
            self.set_inner_html(js_str(value))
        elif name == "title":
            self.attrs["title"] = js_str(value)
        elif name in ("width", "height") and self.tag == "canvas":
            self.props[name] = js_num(value)
        else:
            self.props[name] = value

    def js_to_string(self) -> str:
        return f"[object HTML{self.tag.capitalize()}Element]"

    def __repr__(self):
        ident = self.attrs.get("id")
        return f"<Element {self.tag}{('#' + ident) if ident else ''}>"


def _serialize(node) -> str:
    if isinstance(node, TextNode):
        return _html.escape(node.text, quote=False)
    attrs = "".join(f' {k}="{_html.escape(str(v), quote=True)}"'
                    for k, v in node.attrs.items())
    if node.tag in VOID_TAGS:
        return f"<{node.tag}{attrs}>"
    inner = "".join(_serialize(c) for c in node.child_nodes)
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"


class _FragmentParser(HTMLParser):
    def __init__(self, document):
        super().__init__(convert_charrefs=True)
        self.document = document
        self.root_nodes: list = []
        self.stack: list = []

    def _append(self, node):
        if self.stack:
            self.stack[-1].append_child(node)
        else:
            self.root_nodes.append(node)

    def handle_starttag(self, tag, attrs):
        el = Element(tag, self.document)
        for k, v in attrs:
            el.attrs[k] = v if v is not None else ""
        self._append(el)
        if tag.lower() not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, self.document)
        for k, v in attrs:
            el.attrs[k] = v if v is not None else ""
        self._append(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag.lower():
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._append(TextNode(data))


def parse_fragment(markup: str, document) -> list:
    p = _FragmentParser(document)
    p.feed(markup)
    p.close()
    return p.root_nodes


class Document:
    def __init__(self):
        self.root = Element("html", self)
        self.body = Element("body", self)
        self.root.append_child(self.body)
        self.listeners: dict = {}
        self.props: dict = {}

    def get_element_by_id(self, ident: str):
        def walk(node):
            for c in node.child_nodes:
                if isinstance(c, Element):
                    if c.attrs.get("id") == ident:
                        return c
                    found = walk(c)
                    if found is not None:
                        return found
            return None

        return walk(self.root)

    def fire(self, interp, typ: str, event):
        for fn in list(self.listeners.get(typ, [])):
            interp.call(fn, UNDEFINED, [event])

    def js_get(self, name: str):
        doc = self
        if name == "body":
            return self.body
        if name == "title":
            return self.props.get("title", "")
        if name in self.props:
            return self.props[name]

        @native(name)
        def method(interp, this, args):
            if name == "getElementById":
                el = doc.get_element_by_id(js_str(args[0]))
                return el if el is not None else None
            if name == "createElement":
                return Element(js_str(args[0]), doc)
            if name == "createTextNode":
                return TextNode(js_str(args[0]))
            if name == "addEventListener":
                doc.listeners.setdefault(js_str(args[0]), []).append(args[1])
                return UNDEFINED
            if name == "querySelector":
                found = doc.root.query_all(js_str(args[0]))
                return found[0] if found else None
            if name == "querySelectorAll":
                return JSArray(doc.root.query_all(js_str(args[0])))
            raise JSError(make_error(
                "TypeError", f"document.{name} unsupported in jsvm"))

        if name in ("getElementById", "createElement", "createTextNode",
                    "addEventListener", "querySelector", "querySelectorAll"):
            return method
        return UNDEFINED

    def js_set(self, name: str, value):
        self.props[name] = value


def make_event(target, typ: str, **extra) -> JSObject:
    e = JSObject()
    e.props["type"] = typ
    e.props["target"] = target

    @native("preventDefault")
    def prevent(interp, this, args):
        return UNDEFINED

    @native("stopPropagation")
    def stop(interp, this, args):
        return UNDEFINED

    e.props["preventDefault"] = prevent
    e.props["stopPropagation"] = stop
    for k, v in extra.items():
        e.props[k] = v
    return e


class Window:
    """`window` proxies the interpreter's global scope.

    `window.X = value` stores into a window-property overlay (in real
    browsers window properties are var-style globals distinct from a
    top-level `const X`); bare-name reads of the same X resolve to the
    lexical global, reads of `window.X` check the overlay first and fall
    back to globals.  A window property whose name has no lexical global
    yet also becomes readable as a bare name (var semantics)."""

    def __init__(self, env, extras: dict):
        self.env = env
        self.extras = extras
        self.props: dict = {}

    def js_get(self, name: str):
        if name in self.extras:
            return self.extras[name]
        if name in self.props:
            return self.props[name]
        if self.env.has(name):
            return self.env.lookup(name)
        return UNDEFINED

    def js_set(self, name: str, value):
        self.props[name] = value
        if not self.env.has(name):
            self.env.declare(name, value)


class FakeWebSocket:
    """WebSocket double. The page script sets on* handlers; tests drive
    open()/deliver()/close() and read .sent."""

    def __init__(self, page, url: str):
        self.page = page
        self.url = url
        self.props: dict = {"readyState": 0.0}
        self.sent: list = []
        self.closed = False

    # test-side drivers -------------------------------------------------
    def open(self):
        self.props["readyState"] = 1.0
        self._call("onopen", make_event(self, "open"))

    def deliver(self, text: str):
        self._call("onmessage", make_event(self, "message", data=text))

    def server_close(self):
        if not self.closed:
            self.closed = True
            self.props["readyState"] = 3.0
            self._call("onclose", make_event(self, "close"))

    def error(self):
        self._call("onerror", make_event(self, "error"))

    def _call(self, name, event):
        fn = self.props.get(name)
        if isinstance(fn, CALLABLE):
            self.page.interp.call(fn, self, [event])

    # JS surface --------------------------------------------------------
    def js_get(self, name: str):
        if name in self.props:
            return self.props[name]
        ws = self

        @native(name)
        def method(interp, this, args):
            if name == "close":
                ws.server_close()
                return UNDEFINED
            if name == "send":
                ws.sent.append(js_str(_arg(args, 0, "")))
                return UNDEFINED
            throw_type_error(f"WebSocket.{name} unsupported in jsvm")

        if name in ("close", "send"):
            return method
        return UNDEFINED

    def js_set(self, name: str, value):
        self.props[name] = value


class Timers:
    def __init__(self, clock):
        self.clock = clock  # 1-element [ms]
        self.next_id = 1
        self.pending: dict = {}  # id -> (fire_at_ms, interval_ms|None, fn)

    def set(self, fn, delay_ms: float, interval: bool) -> int:
        tid = self.next_id
        self.next_id += 1
        delay_ms = max(0.0, delay_ms)
        self.pending[tid] = [self.clock[0] + delay_ms,
                             delay_ms if interval else None, fn]
        return tid

    def clear(self, tid: int):
        self.pending.pop(tid, None)

    def advance(self, interp, ms: float):
        """Advance the virtual clock, firing due timers in time order."""
        deadline = self.clock[0] + ms
        while True:
            due = [(at, tid) for tid, (at, _, _) in self.pending.items()
                   if at <= deadline]
            if not due:
                break
            due.sort()
            at, tid = due[0]
            entry = self.pending.get(tid)
            if entry is None:
                continue
            self.clock[0] = max(self.clock[0], at)
            fire_at, interval, fn = entry
            if interval is None:
                del self.pending[tid]
            else:
                entry[0] = self.clock[0] + max(interval, 1.0)
            interp.call(fn, UNDEFINED, [])
        self.clock[0] = deadline
