"""Member dispatch + standard-library builtins for the jsvm subset.

Host (browser) objects participate by implementing ``js_get(name)`` /
``js_set(name, value)``; unknown names must return UNDEFINED, matching JS
property semantics.
"""

from __future__ import annotations

import json as _json
import math
import random
from datetime import datetime, timezone
from functools import cmp_to_key

from .interp import (
    CALLABLE, UNDEFINED, BoundMethod, Interpreter, JSArray, JSClass, JSError,
    JSFunction, JSMap, JSObject, JSPromise, JSSet, NativeFunction, js_iter,
    js_num, js_num_str, js_str, js_truthy, make_error, strict_eq,
    throw_type_error,
)


def native(name):
    def deco(fn):
        return NativeFunction(name, fn)
    return deco


def _arg(args, i, default=UNDEFINED):
    return args[i] if i < len(args) else default


# ---------------------------------------------------------------- dispatch

def get_member(interp, obj, name: str):
    if obj is UNDEFINED or obj is None:
        throw_type_error(
            f"Cannot read properties of {js_str(obj)} (reading '{name}')")
    if isinstance(obj, str):
        return _string_member(obj, name)
    if isinstance(obj, bool) or isinstance(obj, float):
        return _number_member(js_num(obj), name)
    if isinstance(obj, JSArray):
        return _array_member(obj, name)
    if isinstance(obj, JSMap):
        return _map_member(obj, name)
    if isinstance(obj, JSSet):
        return _set_member(obj, name)
    if isinstance(obj, JSPromise):
        return _promise_member(obj, name)
    if isinstance(obj, JSObject):
        if name in obj.props:
            return obj.props[name]
        if obj.js_class is not None and name in obj.js_class.methods:
            return BoundMethod(obj.js_class.methods[name], obj)
        if obj.js_class is not None and name == "constructor":
            return obj.js_class
        return UNDEFINED
    if isinstance(obj, JSClass):
        if name in obj.statics:
            return obj.statics[name]
        if name == "name":
            return obj.name
        return UNDEFINED
    if isinstance(obj, (JSFunction, NativeFunction)):
        if name in obj.props:
            return obj.props[name]
        if name == "name":
            return obj.name
        return UNDEFINED
    getter = getattr(obj, "js_get", None)
    if getter is not None:
        return getter(name)
    throw_type_error(f"cannot read property '{name}' of host value {obj!r}")


def set_member(interp, obj, name: str, value):
    if obj is UNDEFINED or obj is None:
        throw_type_error(
            f"Cannot set properties of {js_str(obj)} (setting '{name}')")
    if isinstance(obj, JSObject):
        obj.props[name] = value
        return
    if isinstance(obj, (JSFunction, NativeFunction)):
        obj.props[name] = value
        return
    if isinstance(obj, JSArray) and name == "length":
        n = int(js_num(value))
        del obj.items[n:]
        return
    setter = getattr(obj, "js_set", None)
    if setter is not None:
        setter(name, value)
        return
    # silent no-op writes (e.g. onto numbers) match JS non-strict-target
    # semantics closely enough for the frontend; host objects above are
    # the ones that matter
    throw_type_error(f"cannot set property '{name}' on {js_str(obj)}")


def get_index(interp, obj, idx):
    if isinstance(obj, JSArray) and isinstance(idx, float):
        i = int(idx)
        if 0 <= i < len(obj.items):
            return obj.items[i]
        return UNDEFINED
    if isinstance(obj, str) and isinstance(idx, float):
        i = int(idx)
        if 0 <= i < len(obj):
            return obj[i]
        return UNDEFINED
    return get_member(interp, obj, js_str(idx))


def set_index(interp, obj, idx, value):
    if isinstance(obj, JSArray) and isinstance(idx, float):
        i = int(idx)
        while len(obj.items) <= i:
            obj.items.append(UNDEFINED)
        obj.items[i] = value
        return
    set_member(interp, obj, js_str(idx), value)


# ---------------------------------------------------------------- strings

def _string_member(s: str, name: str):
    if name == "length":
        return float(len(s))

    @native(name)
    def method(interp, this, args):
        if name == "toLowerCase":
            return s.lower()
        if name == "toUpperCase":
            return s.upper()
        if name == "includes":
            return js_str(_arg(args, 0)) in s
        if name == "startsWith":
            return s.startswith(js_str(_arg(args, 0)))
        if name == "endsWith":
            return s.endswith(js_str(_arg(args, 0)))
        if name == "indexOf":
            return float(s.find(js_str(_arg(args, 0))))
        if name == "padStart":
            width = int(js_num(_arg(args, 0, 0.0)))
            fill = js_str(_arg(args, 1, " ")) or " "
            out = s
            while len(out) < width:
                out = fill[: width - len(out)] + out
            return out
        if name == "padEnd":
            width = int(js_num(_arg(args, 0, 0.0)))
            fill = js_str(_arg(args, 1, " ")) or " "
            out = s
            while len(out) < width:
                out = out + fill[: width - len(out)]
            return out
        if name == "replaceAll":
            return s.replace(js_str(_arg(args, 0)), js_str(_arg(args, 1)))
        if name == "split":
            sep = _arg(args, 0)
            if sep is UNDEFINED:
                return JSArray([s])
            sep = js_str(sep)
            return JSArray(s.split(sep) if sep else list(s))
        if name == "slice":
            start, end = _slice_bounds(len(s), args)
            return s[start:end]
        if name == "substring":
            a = max(0, int(js_num(_arg(args, 0, 0.0))))
            b = (len(s) if _arg(args, 1) is UNDEFINED
                 else max(0, int(js_num(args[1]))))
            return s[min(a, b): max(a, b)]
        if name == "trim":
            return s.strip()
        if name == "charAt":
            i = int(js_num(_arg(args, 0, 0.0)))
            return s[i] if 0 <= i < len(s) else ""
        if name == "repeat":
            return s * int(js_num(_arg(args, 0, 0.0)))
        if name == "toString":
            return s
        if name == "localeCompare":
            other = js_str(_arg(args, 0))
            return float((s > other) - (s < other))
        throw_type_error(f"string method {name} unsupported in jsvm")

    if name in ("toLowerCase", "toUpperCase", "includes", "startsWith",
                "endsWith", "indexOf", "padStart", "padEnd", "replaceAll",
                "split", "slice", "substring", "trim", "charAt", "repeat",
                "toString", "localeCompare"):
        return method
    return UNDEFINED


def _slice_bounds(n: int, args) -> tuple[int, int]:
    start = 0 if _arg(args, 0) is UNDEFINED else int(js_num(args[0]))
    end = n if _arg(args, 1) is UNDEFINED else int(js_num(args[1]))
    if start < 0:
        start = max(0, n + start)
    if end < 0:
        end = max(0, n + end)
    return min(start, n), min(end, n)


# ---------------------------------------------------------------- numbers

def _number_member(x: float, name: str):
    @native(name)
    def method(interp, this, args):
        if name == "toFixed":
            digits = int(js_num(_arg(args, 0, 0.0)))
            if math.isnan(x):
                return "NaN"
            return f"{x:.{digits}f}"
        if name == "toLocaleString":
            if float(x).is_integer():
                return f"{int(x):,}"
            return f"{x:,.3f}"
        if name == "toString":
            return js_num_str(x)
        throw_type_error(f"number method {name} unsupported in jsvm")

    if name in ("toFixed", "toLocaleString", "toString"):
        return method
    return UNDEFINED


# ---------------------------------------------------------------- arrays

_ARRAY_METHODS = {
    "push", "pop", "shift", "unshift", "splice", "slice", "filter", "map",
    "forEach", "reduce", "sort", "join", "indexOf", "includes", "every",
    "some", "flatMap", "fill", "find", "findIndex", "concat", "reverse",
    "flat", "keys", "entries", "toString",
}


def _array_member(arr: JSArray, name: str):
    if name == "length":
        return float(len(arr.items))
    if name not in _ARRAY_METHODS:
        return UNDEFINED

    @native(name)
    def method(interp, this, args):
        items = arr.items
        if name == "push":
            items.extend(args)
            return float(len(items))
        if name == "pop":
            return items.pop() if items else UNDEFINED
        if name == "shift":
            return items.pop(0) if items else UNDEFINED
        if name == "unshift":
            items[:0] = args
            return float(len(items))
        if name == "splice":
            start = int(js_num(_arg(args, 0, 0.0)))
            if start < 0:
                start = max(0, len(items) + start)
            start = min(start, len(items))
            count = (len(items) - start if _arg(args, 1) is UNDEFINED
                     else max(0, int(js_num(args[1]))))
            removed = items[start:start + count]
            items[start:start + count] = list(args[2:])
            return JSArray(removed)
        if name == "slice":
            a, b = _slice_bounds(len(items), args)
            return JSArray(items[a:b])
        if name == "filter":
            cb = args[0]
            return JSArray([v for i, v in enumerate(list(items))
                            if js_truthy(interp.call(cb, UNDEFINED,
                                                     [v, float(i), arr]))])
        if name == "map":
            cb = args[0]
            return JSArray([interp.call(cb, UNDEFINED, [v, float(i), arr])
                            for i, v in enumerate(list(items))])
        if name == "flatMap":
            cb = args[0]
            out = []
            for i, v in enumerate(list(items)):
                r = interp.call(cb, UNDEFINED, [v, float(i), arr])
                if isinstance(r, JSArray):
                    out.extend(r.items)
                else:
                    out.append(r)
            return JSArray(out)
        if name == "flat":
            out = []
            for v in items:
                if isinstance(v, JSArray):
                    out.extend(v.items)
                else:
                    out.append(v)
            return JSArray(out)
        if name == "forEach":
            cb = args[0]
            for i, v in enumerate(list(items)):
                interp.call(cb, UNDEFINED, [v, float(i), arr])
            return UNDEFINED
        if name == "reduce":
            cb = args[0]
            vals = list(items)
            if len(args) >= 2:
                acc = args[1]
                start = 0
            else:
                if not vals:
                    throw_type_error("Reduce of empty array with no initial value")
                acc = vals[0]
                start = 1
            for i in range(start, len(vals)):
                acc = interp.call(cb, UNDEFINED, [acc, vals[i], float(i), arr])
            return acc
        if name == "sort":
            if args and args[0] is not UNDEFINED:
                cb = args[0]

                def cmp(a, b):
                    r = js_num(interp.call(cb, UNDEFINED, [a, b]))
                    if math.isnan(r):
                        return 0
                    return -1 if r < 0 else (1 if r > 0 else 0)

                items.sort(key=cmp_to_key(cmp))
            else:
                items.sort(key=js_str)
            return arr
        if name == "join":
            sep = "," if _arg(args, 0) is UNDEFINED else js_str(args[0])
            return sep.join("" if v is UNDEFINED or v is None else js_str(v)
                            for v in items)
        if name == "indexOf":
            target = _arg(args, 0)
            for i, v in enumerate(items):
                if strict_eq(v, target):
                    return float(i)
            return -1.0
        if name == "includes":
            target = _arg(args, 0)
            return any(strict_eq(v, target) for v in items)
        if name == "every":
            cb = args[0]
            return all(js_truthy(interp.call(cb, UNDEFINED, [v, float(i), arr]))
                       for i, v in enumerate(list(items)))
        if name == "some":
            cb = args[0]
            return any(js_truthy(interp.call(cb, UNDEFINED, [v, float(i), arr]))
                       for i, v in enumerate(list(items)))
        if name == "find":
            cb = args[0]
            for i, v in enumerate(list(items)):
                if js_truthy(interp.call(cb, UNDEFINED, [v, float(i), arr])):
                    return v
            return UNDEFINED
        if name == "findIndex":
            cb = args[0]
            for i, v in enumerate(list(items)):
                if js_truthy(interp.call(cb, UNDEFINED, [v, float(i), arr])):
                    return float(i)
            return -1.0
        if name == "fill":
            val = _arg(args, 0)
            for i in range(len(items)):
                items[i] = val
            return arr
        if name == "concat":
            out = list(items)
            for a in args:
                if isinstance(a, JSArray):
                    out.extend(a.items)
                else:
                    out.append(a)
            return JSArray(out)
        if name == "reverse":
            items.reverse()
            return arr
        if name == "keys":
            return JSArray([float(i) for i in range(len(items))])
        if name == "entries":
            return JSArray([JSArray([float(i), v])
                            for i, v in enumerate(items)])
        if name == "toString":
            return js_str(arr)
        raise AssertionError(name)

    return method


# ---------------------------------------------------------------- Map / Set

def _map_member(m: JSMap, name: str):
    if name == "size":
        return float(len(m.entries))

    @native(name)
    def method(interp, this, args):
        if name == "get":
            return m.entries.get(_map_key(_arg(args, 0)), UNDEFINED)
        if name == "set":
            m.entries[_map_key(_arg(args, 0))] = _arg(args, 1)
            return m
        if name == "has":
            return _map_key(_arg(args, 0)) in m.entries
        if name == "delete":
            return m.entries.pop(_map_key(_arg(args, 0)), _MISSING) is not _MISSING
        if name == "clear":
            m.entries.clear()
            return UNDEFINED
        if name == "forEach":
            cb = args[0]
            for k, v in list(m.entries.items()):
                interp.call(cb, UNDEFINED, [v, k, m])
            return UNDEFINED
        if name == "keys":
            return JSArray(list(m.entries.keys()))
        if name == "values":
            return JSArray(list(m.entries.values()))
        if name == "entries":
            return JSArray([JSArray([k, v]) for k, v in m.entries.items()])
        throw_type_error(f"Map method {name} unsupported in jsvm")

    if name in ("get", "set", "has", "delete", "clear", "forEach", "keys",
                "values", "entries"):
        return method
    return UNDEFINED


_MISSING = object()


def _map_key(k):
    # SameValueZero over the frontend's key universe (strings + numbers)
    if isinstance(k, bool):
        return ("bool", k)
    if isinstance(k, float):
        return k
    return k if isinstance(k, str) else ("id", id(k))


def _set_member(s: JSSet, name: str):
    if name == "size":
        return float(len(s.values))

    @native(name)
    def method(interp, this, args):
        if name == "add":
            s.values[_map_key(_arg(args, 0))] = _arg(args, 0)
            return s
        if name == "has":
            return _map_key(_arg(args, 0)) in s.values
        if name == "delete":
            return s.values.pop(_map_key(_arg(args, 0)), _MISSING) is not _MISSING
        if name == "clear":
            s.values.clear()
            return UNDEFINED
        if name == "forEach":
            cb = args[0]
            for v in list(s.values.values()):
                interp.call(cb, UNDEFINED, [v, v, s])
            return UNDEFINED
        throw_type_error(f"Set method {name} unsupported in jsvm")

    if name in ("add", "has", "delete", "clear", "forEach"):
        return method
    return UNDEFINED


def _promise_member(p: JSPromise, name: str):
    @native(name)
    def method(interp, this, args):
        if name == "then":
            cb = _arg(args, 0)
            if p.state == "resolved" and isinstance(cb, CALLABLE):
                r = interp.call(cb, UNDEFINED, [p.value])
                return r if isinstance(r, JSPromise) else JSPromise.resolve(r)
            if p.state == "rejected":
                on_rej = _arg(args, 1)
                if isinstance(on_rej, CALLABLE):
                    r = interp.call(on_rej, UNDEFINED, [p.value])
                    return r if isinstance(r, JSPromise) else JSPromise.resolve(r)
            return p
        if name == "catch":
            cb = _arg(args, 0)
            if p.state == "rejected" and isinstance(cb, CALLABLE):
                r = interp.call(cb, UNDEFINED, [p.value])
                return r if isinstance(r, JSPromise) else JSPromise.resolve(r)
            return p
        throw_type_error(f"Promise method {name} unsupported in jsvm")

    if name in ("then", "catch"):
        return method
    return UNDEFINED


# ---------------------------------------------------------------- Date

class JSDate:
    """Host Date object over the interpreter's virtual clock (ms)."""

    def __init__(self, ms: float):
        self.ms = float(ms)

    def _dt(self) -> datetime:
        return datetime.fromtimestamp(self.ms / 1000.0, tz=timezone.utc)

    def js_get(self, name: str):
        @native(name)
        def method(interp, this, args):
            if name == "getTime" or name == "valueOf":
                return self.ms
            if name == "toISOString":
                dt = self._dt()
                return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"
            if name == "toLocaleTimeString":
                return self._dt().strftime("%H:%M:%S")
            if name == "toLocaleString":
                return self._dt().strftime("%Y-%m-%d %H:%M:%S")
            if name == "getSeconds":
                return float(self._dt().second)
            if name == "getMinutes":
                return float(self._dt().minute)
            if name == "getHours":
                return float(self._dt().hour)
            throw_type_error(f"Date method {name} unsupported in jsvm")

        if name in ("getTime", "valueOf", "toISOString", "toLocaleTimeString",
                    "toLocaleString", "getSeconds", "getMinutes", "getHours"):
            return method
        return UNDEFINED

    def js_to_string(self) -> str:
        return self._dt().strftime("%a %b %d %Y %H:%M:%S GMT+0000")


def parse_date_ms(s: str) -> float:
    try:
        txt = s.strip()
        if txt.endswith("Z"):
            txt = txt[:-1] + "+00:00"
        dt = datetime.fromisoformat(txt)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp() * 1000.0
    except (ValueError, TypeError):
        return float("nan")


# ---------------------------------------------------------------- JSON

def json_to_js(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return JSArray([json_to_js(x) for x in v])
    if isinstance(v, dict):
        o = JSObject()
        for k, val in v.items():
            o.props[str(k)] = json_to_js(val)
        return o
    raise AssertionError(f"unexpected JSON value {v!r}")


def js_to_json(v):
    if v is None:
        return None
    if v is True or v is False:
        return v
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return int(v) if v.is_integer() else v
    if isinstance(v, str):
        return v
    if isinstance(v, JSArray):
        return [None if x is UNDEFINED else js_to_json(x) for x in v.items]
    if isinstance(v, JSObject):
        return {k: js_to_json(val) for k, val in v.props.items()
                if val is not UNDEFINED and not isinstance(val, CALLABLE)}
    if isinstance(v, JSDate):
        return v.js_get("toISOString")  # not reached in practice
    return None


# ---------------------------------------------------------------- install

def install_builtins(env) -> None:
    # console -- collected per-interpreter via env var '__console__'
    console_lines: list = []
    console = JSObject()

    def log_fn(level):
        @native(level)
        def fn(interp, this, args):
            console_lines.append((level, " ".join(js_str(a) for a in args)))
            return UNDEFINED
        return fn

    for level in ("log", "info", "warn", "error", "debug"):
        console.props[level] = log_fn(level)
    env.declare("console", console)
    env.declare("__console_lines__", console_lines)

    # Math
    rng = random.Random(0xC0FFEE)
    m = JSObject()
    m.props["PI"] = math.pi
    m.props["E"] = math.e

    def math_fn(name, f):
        @native(name)
        def fn(interp, this, args):
            return f(args)
        m.props[name] = fn

    math_fn("max", lambda a: max((js_num(x) for x in a), default=float("-inf")))
    math_fn("min", lambda a: min((js_num(x) for x in a), default=float("inf")))
    math_fn("floor", lambda a: float(math.floor(js_num(a[0]))))
    math_fn("ceil", lambda a: float(math.ceil(js_num(a[0]))))
    math_fn("round", lambda a: float(math.floor(js_num(a[0]) + 0.5)))
    math_fn("abs", lambda a: abs(js_num(a[0])))
    math_fn("sqrt", lambda a: math.sqrt(js_num(a[0])) if js_num(a[0]) >= 0 else float("nan"))
    math_fn("log", lambda a: math.log(js_num(a[0])) if js_num(a[0]) > 0 else float("-inf") if js_num(a[0]) == 0 else float("nan"))
    math_fn("exp", lambda a: math.exp(js_num(a[0])))
    math_fn("sin", lambda a: math.sin(js_num(a[0])))
    math_fn("cos", lambda a: math.cos(js_num(a[0])))
    math_fn("tan", lambda a: math.tan(js_num(a[0])))
    math_fn("pow", lambda a: js_num(a[0]) ** js_num(a[1]))
    math_fn("hypot", lambda a: math.hypot(*[js_num(x) for x in a]))
    math_fn("sign", lambda a: math.copysign(1.0, js_num(a[0])) if js_num(a[0]) != 0 else 0.0)
    math_fn("random", lambda a: rng.random())

    def _imul(a):
        from .interp import _to_int32
        x = _to_int32(js_num(a[0])) & 0xFFFFFFFF
        y = _to_int32(js_num(a[1])) & 0xFFFFFFFF
        r = (x * y) & 0xFFFFFFFF
        return float(r - 0x100000000 if r >= 0x80000000 else r)

    math_fn("imul", _imul)
    math_fn("trunc", lambda a: float(math.trunc(js_num(a[0]))))
    math_fn("atan2", lambda a: math.atan2(js_num(a[0]), js_num(a[1])))
    env.declare("Math", m)
    env.declare("__math_rng__", rng)

    # JSON
    j = JSObject()

    @native("stringify")
    def json_stringify(interp, this, args):
        v = js_to_json(_arg(args, 0))
        indent = _arg(args, 2)
        kw = {}
        if isinstance(indent, float):
            kw["indent"] = int(indent)
        return _json.dumps(v, **kw)

    @native("parse")
    def json_parse(interp, this, args):
        try:
            return json_to_js(_json.loads(js_str(_arg(args, 0))))
        except (_json.JSONDecodeError, TypeError) as e:
            raise JSError(make_error("SyntaxError", f"JSON.parse: {e}"))

    j.props["stringify"] = json_stringify
    j.props["parse"] = json_parse
    env.declare("JSON", j)

    # Object
    o = JSObject()

    @native("entries")
    def obj_entries(interp, this, args):
        target = _arg(args, 0)
        if isinstance(target, JSObject):
            return JSArray([JSArray([k, v]) for k, v in target.props.items()])
        if isinstance(target, JSMap):
            throw_type_error("Object.entries on a Map (use map.entries())")
        return JSArray([])

    @native("keys")
    def obj_keys(interp, this, args):
        target = _arg(args, 0)
        if isinstance(target, JSObject):
            return JSArray(list(target.props.keys()))
        return JSArray([])

    @native("values")
    def obj_values(interp, this, args):
        target = _arg(args, 0)
        if isinstance(target, JSObject):
            return JSArray(list(target.props.values()))
        return JSArray([])

    @native("assign")
    def obj_assign(interp, this, args):
        target = _arg(args, 0)
        if not isinstance(target, JSObject):
            throw_type_error("Object.assign target must be an object")
        for src in args[1:]:
            if isinstance(src, JSObject):
                target.props.update(src.props)
        return target

    @native("fromEntries")
    def obj_from_entries(interp, this, args):
        out = JSObject()
        for pair in js_iter(_arg(args, 0)):
            items = list(js_iter(pair))
            out.props[js_str(items[0])] = items[1] if len(items) > 1 else UNDEFINED
        return out

    o.props.update(entries=obj_entries, keys=obj_keys, values=obj_values,
                   assign=obj_assign, fromEntries=obj_from_entries)
    env.declare("Object", o)

    # Array statics + constructor
    @native("Array")
    def array_ctor(interp, this, args):
        if len(args) == 1 and isinstance(args[0], float):
            return JSArray([UNDEFINED] * int(args[0]))
        return JSArray(list(args))

    @native("from")
    def array_from(interp, this, args):
        src = _arg(args, 0)
        mapper = _arg(args, 1)
        if isinstance(src, JSObject) and "length" in src.props:
            items = [UNDEFINED] * int(js_num(src.props["length"]))
        else:
            items = list(js_iter(src))
        if isinstance(mapper, CALLABLE):
            items = [interp.call(mapper, UNDEFINED, [v, float(i)])
                     for i, v in enumerate(items)]
        return JSArray(items)

    @native("isArray")
    def array_is(interp, this, args):
        return isinstance(_arg(args, 0), JSArray)

    array_ctor.props["from"] = array_from
    array_ctor.props["isArray"] = array_is
    env.declare("Array", array_ctor)

    # Map / Set constructors
    @native("Map")
    def map_ctor(interp, this, args):
        m2 = JSMap()
        init = _arg(args, 0)
        if init not in (UNDEFINED, None):
            for pair in js_iter(init):
                items = list(js_iter(pair))
                m2.entries[_map_key(items[0])] = items[1] if len(items) > 1 else UNDEFINED
        return m2

    @native("Set")
    def set_ctor(interp, this, args):
        s2 = JSSet()
        init = _arg(args, 0)
        if init not in (UNDEFINED, None):
            for v in js_iter(init):
                s2.values[_map_key(v)] = v
        return s2

    env.declare("Map", map_ctor)
    env.declare("Set", set_ctor)

    # Date -- uses the virtual clock on env '__clock_ms__' (a 1-element list
    # so the browser harness can advance it)
    clock = [1766000000000.0]  # arbitrary fixed epoch for determinism
    env.declare("__clock_ms__", clock)

    @native("Date")
    def date_ctor(interp, this, args):
        if not args:
            return JSDate(clock[0])
        a0 = args[0]
        if isinstance(a0, float):
            return JSDate(a0)
        if isinstance(a0, str):
            return JSDate(parse_date_ms(a0))
        if isinstance(a0, JSDate):
            return JSDate(a0.ms)
        return JSDate(clock[0])

    @native("now")
    def date_now(interp, this, args):
        return clock[0]

    @native("parse")
    def date_parse(interp, this, args):
        return parse_date_ms(js_str(_arg(args, 0)))

    date_ctor.props["now"] = date_now
    date_ctor.props["parse"] = date_parse
    env.declare("Date", date_ctor)

    # Number / String / Boolean conversions + global numeric helpers
    @native("Number")
    def number_fn(interp, this, args):
        return js_num(_arg(args, 0, 0.0))

    @native("isFinite")
    def num_is_finite(interp, this, args):
        v = _arg(args, 0)
        return isinstance(v, float) and math.isfinite(v)

    @native("isInteger")
    def num_is_integer(interp, this, args):
        v = _arg(args, 0)
        return isinstance(v, float) and math.isfinite(v) and v.is_integer()

    @native("isNaN")
    def num_is_nan(interp, this, args):
        v = _arg(args, 0)
        return isinstance(v, float) and math.isnan(v)

    number_fn.props["isFinite"] = num_is_finite
    number_fn.props["isInteger"] = num_is_integer
    number_fn.props["isNaN"] = num_is_nan
    number_fn.props["MAX_SAFE_INTEGER"] = float(2**53 - 1)
    env.declare("Number", number_fn)

    @native("String")
    def string_fn(interp, this, args):
        return js_str(_arg(args, 0, ""))

    env.declare("String", string_fn)

    @native("Boolean")
    def boolean_fn(interp, this, args):
        return js_truthy(_arg(args, 0))

    env.declare("Boolean", boolean_fn)

    @native("isFinite")
    def global_is_finite(interp, this, args):
        n = js_num(_arg(args, 0))
        return math.isfinite(n)

    env.declare("isFinite", global_is_finite)

    @native("isNaN")
    def global_is_nan(interp, this, args):
        return math.isnan(js_num(_arg(args, 0)))

    env.declare("isNaN", global_is_nan)

    @native("parseFloat")
    def parse_float(interp, this, args):
        s = js_str(_arg(args, 0)).strip()
        out = ""
        for i, c in enumerate(s):
            if c.isdigit() or c in "+-." or (c in "eE" and out):
                out += c
            else:
                break
        try:
            return float(out)
        except ValueError:
            return float("nan")

    env.declare("parseFloat", parse_float)

    @native("parseInt")
    def parse_int(interp, this, args):
        s = js_str(_arg(args, 0)).strip()
        out = ""
        for i, c in enumerate(s):
            if c.isdigit() or (c in "+-" and i == 0):
                out += c
            else:
                break
        try:
            return float(int(out))
        except ValueError:
            return float("nan")

    env.declare("parseInt", parse_int)

    env.declare("NaN", float("nan"))
    env.declare("Infinity", float("inf"))
    env.declare("undefined", UNDEFINED)

    # Promise (minimal -- stubs resolve synchronously)
    @native("Promise")
    def promise_ctor(interp, this, args):
        executor = _arg(args, 0)
        box = {"state": "pending", "value": UNDEFINED}

        @native("resolve")
        def res(i2, t2, a2):
            box["state"] = "resolved"
            box["value"] = _arg(a2, 0)
            return UNDEFINED

        @native("reject")
        def rej(i2, t2, a2):
            box["state"] = "rejected"
            box["value"] = _arg(a2, 0)
            return UNDEFINED

        interp.call(executor, UNDEFINED, [res, rej])
        if box["state"] == "pending":
            box["state"] = "resolved"
        return JSPromise(box["state"], box["value"])

    @native("resolve")
    def promise_resolve(interp, this, args):
        return JSPromise.resolve(_arg(args, 0))

    @native("reject")
    def promise_reject(interp, this, args):
        return JSPromise.reject(_arg(args, 0))

    promise_ctor.props["resolve"] = promise_resolve
    promise_ctor.props["reject"] = promise_reject
    env.declare("Promise", promise_ctor)

    # Error constructors
    for err_name in ("Error", "TypeError", "RangeError", "SyntaxError"):
        def make_err_ctor(kind):
            @native(kind)
            def ctor(interp, this, args):
                return make_error(kind, js_str(_arg(args, 0, "")))
            return ctor
        env.declare(err_name, make_err_ctor(err_name))
