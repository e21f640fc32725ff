"""Tree-walking evaluator for the bounded ES subset.

Value model:
  undefined -> UNDEFINED singleton        null  -> Python None
  number    -> Python float               bool  -> Python bool
  string    -> Python str
  array     -> JSArray                    object -> JSObject
  Map/Set   -> JSMap / JSSet              function -> JSFunction / NativeFunction
  host objects (DOM nodes, WebSocket stubs, ...) implement js_get/js_set.

Async functions execute synchronously; `await` unwraps JSPromise values
(the browser stubs resolve synchronously).  A rejected promise or a throw
inside an un-awaited async function propagates as a Python exception --
stricter than a real event loop, which is exactly what a test harness
wants.
"""

from __future__ import annotations

import math
from functools import cmp_to_key


class Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEFINED = Undefined()


class JSError(Exception):
    """A thrown JS value."""

    def __init__(self, value):
        self.value = value
        super().__init__(js_str(value))


def throw_type_error(msg: str):
    raise JSError(make_error("TypeError", msg))


def make_error(kind: str, msg: str) -> "JSObject":
    o = JSObject()
    o.props["name"] = kind
    o.props["message"] = msg
    return o


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class JSObject:
    __slots__ = ("props", "js_class")

    def __init__(self, js_class=None):
        self.props: dict = {}
        self.js_class = js_class

    def __repr__(self):
        return f"JSObject({self.props!r})"


class JSArray:
    __slots__ = ("items",)

    def __init__(self, items=None):
        self.items: list = items if items is not None else []

    def __repr__(self):
        return f"JSArray({self.items!r})"


class JSMap:
    __slots__ = ("entries",)

    def __init__(self):
        self.entries: dict = {}  # insertion-ordered

    @staticmethod
    def _key(k):
        # JS Map uses SameValueZero; our keys are strings/numbers
        return k

    def __repr__(self):
        return f"JSMap({self.entries!r})"


class JSSet:
    __slots__ = ("values",)

    def __init__(self):
        self.values: dict = {}  # key -> True, insertion-ordered

    def __repr__(self):
        return f"JSSet({list(self.values)!r})"


class JSFunction:
    __slots__ = ("name", "params", "body", "env", "is_arrow", "is_async",
                 "this_val", "expr_body", "props")

    def __init__(self, name, params, body, env, is_arrow, is_async,
                 this_val=UNDEFINED, expr_body=False):
        self.name = name or ""
        self.params = params
        self.body = body
        self.env = env
        self.is_arrow = is_arrow
        self.is_async = is_async
        self.this_val = this_val
        self.expr_body = expr_body
        self.props: dict = {}

    def __repr__(self):
        return f"<JSFunction {self.name or '(anon)'}>"


class NativeFunction:
    __slots__ = ("name", "fn", "props")

    def __init__(self, name, fn):
        self.name = name
        self.fn = fn  # fn(interp, this, args) -> value
        self.props: dict = {}

    def __repr__(self):
        return f"<native {self.name}>"


class BoundMethod:
    __slots__ = ("fn", "this_val")

    def __init__(self, fn, this_val):
        self.fn = fn
        self.this_val = this_val


class JSClass:
    __slots__ = ("name", "methods", "statics")

    def __init__(self, name, methods, statics):
        self.name = name
        self.methods = methods   # name -> JSFunction
        self.statics = statics

    def __repr__(self):
        return f"<class {self.name}>"


class JSPromise:
    __slots__ = ("state", "value")

    def __init__(self, state="resolved", value=UNDEFINED):
        self.state = state  # 'resolved' | 'rejected'
        self.value = value

    @staticmethod
    def resolve(value):
        return JSPromise("resolved", value)

    @staticmethod
    def reject(value):
        return JSPromise("rejected", value)


CALLABLE = (JSFunction, NativeFunction, BoundMethod, JSClass)


# ---------------------------------------------------------------- coercions

def js_truthy(v) -> bool:
    if v is UNDEFINED or v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, float):
        return not (v == 0 or math.isnan(v))
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_num_str(x: float) -> str:
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0:
        return "0"
    if float(x).is_integer() and abs(x) < 1e21:
        return str(int(x))
    return repr(float(x))


def js_str(v) -> str:
    if isinstance(v, str):
        return v
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return js_num_str(v)
    if isinstance(v, JSArray):
        return ",".join("" if e is UNDEFINED or e is None else js_str(e)
                        for e in v.items)
    if isinstance(v, JSObject):
        name = v.props.get("name")
        msg = v.props.get("message")
        if isinstance(name, str) and isinstance(msg, str):
            return f"{name}: {msg}"
        return "[object Object]"
    if isinstance(v, JSMap):
        return "[object Map]"
    if isinstance(v, JSSet):
        return "[object Set]"
    if isinstance(v, CALLABLE):
        name = getattr(v, "name", "")
        return f"function {name}() {{ [native code] }}"
    to_s = getattr(v, "js_to_string", None)
    if to_s is not None:
        return to_s()
    return str(v)


def js_num(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if v is None:
        return 0.0
    if v is UNDEFINED:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(s)
        except ValueError:
            return float("nan")
    if isinstance(v, JSArray):
        if not v.items:
            return 0.0
        if len(v.items) == 1:
            return js_num(v.items[0])
        return float("nan")
    return float("nan")


def js_typeof(v) -> str:
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "object"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, CALLABLE):
        return "function"
    return "object"


def strict_eq(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def loose_eq(a, b) -> bool:
    if (a is None or a is UNDEFINED) and (b is None or b is UNDEFINED):
        return True
    if a is None or a is UNDEFINED or b is None or b is UNDEFINED:
        return False
    if isinstance(a, bool):
        return loose_eq(js_num(a), b)
    if isinstance(b, bool):
        return loose_eq(a, js_num(b))
    if isinstance(a, float) and isinstance(b, str):
        return a == js_num(b)
    if isinstance(a, str) and isinstance(b, float):
        return js_num(a) == b
    return strict_eq(a, b)


def js_iter(v):
    """Iterate a JS iterable -> Python iterator of JS values."""
    if isinstance(v, JSArray):
        return iter(list(v.items))
    if isinstance(v, JSMap):
        return iter([JSArray([k, val]) for k, val in list(v.entries.items())])
    if isinstance(v, JSSet):
        return iter(list(v.values))
    if isinstance(v, str):
        return iter(list(v))
    it = getattr(v, "js_iter", None)
    if it is not None:
        return it()
    throw_type_error(f"{js_typeof(v)} is not iterable")


# ---------------------------------------------------------------- scopes

class Env:
    __slots__ = ("vars", "consts", "parent")

    def __init__(self, parent=None):
        self.vars: dict = {}
        self.consts: set = set()
        self.parent = parent

    def declare(self, name: str, value, const: bool = False):
        self.vars[name] = value
        if const:
            self.consts.add(name)

    def lookup(self, name: str):
        env = self
        while env is not None:
            if name in env.vars:
                return env.vars[name]
            env = env.parent
        raise JSError(make_error("ReferenceError", f"{name} is not defined"))

    def has(self, name: str) -> bool:
        env = self
        while env is not None:
            if name in env.vars:
                return True
            env = env.parent
        return False

    def assign(self, name: str, value):
        env = self
        while env is not None:
            if name in env.vars:
                if name in env.consts:
                    throw_type_error(f"Assignment to constant variable {name}")
                env.vars[name] = value
                return
            env = env.parent
        raise JSError(make_error("ReferenceError", f"{name} is not defined"))


# ---------------------------------------------------------------- interpreter

class Interpreter:
    def __init__(self, global_env: Env | None = None):
        from . import runtime
        self.globals = global_env or Env()
        runtime.install_builtins(self.globals)

    # ---- public API ----

    def run(self, program: dict, env: Env | None = None):
        env = env or self.globals
        self._hoist(program["body"], env)
        result = UNDEFINED
        for stmt in program["body"]:
            result = self.exec_stmt(stmt, env)
        return result

    def run_script(self, src: str, filename: str = "<js>"):
        from .jsparser import parse
        return self.run(parse(src, filename))

    def call(self, fn, this_val, args: list):
        from . import runtime
        if isinstance(fn, BoundMethod):
            return self.call(fn.fn, fn.this_val, args)
        if isinstance(fn, NativeFunction):
            return fn.fn(self, this_val, args)
        if isinstance(fn, JSClass):
            return self.construct(fn, args)
        if not isinstance(fn, JSFunction):
            throw_type_error(f"{js_str(fn)} is not a function")
        env = Env(fn.env)
        self._bind_params(fn.params, args, env)
        if fn.is_arrow:
            this = fn.this_val
        else:
            this = this_val
        env.declare("this", this)
        if fn.expr_body:
            result = self.eval_expr(fn.body, env)
        else:
            result = UNDEFINED
            self._hoist(fn.body["body"], env)
            try:
                for stmt in fn.body["body"]:
                    self.exec_stmt(stmt, env)
            except _Return as r:
                result = r.value
        # async functions resolve synchronously; a throw propagates (see
        # module docstring) rather than becoming an unobserved rejection
        if fn.is_async and not isinstance(result, JSPromise):
            return JSPromise.resolve(result)
        return result

    def construct(self, cls, args: list):
        if isinstance(cls, NativeFunction):
            return cls.fn(self, "__new__", args)
        if not isinstance(cls, JSClass):
            throw_type_error(f"{js_str(cls)} is not a constructor")
        obj = JSObject(js_class=cls)
        ctor = cls.methods.get("constructor")
        if ctor is not None:
            self.call(ctor, obj, args)
        return obj

    # ---- statements ----

    def _hoist(self, stmts: list, env: Env):
        for stmt in stmts:
            if stmt["t"] == "FunctionDecl":
                env.declare(stmt["name"], self._make_function(stmt, env))

    def exec_stmt(self, node: dict, env: Env):
        t = node["t"]
        if t == "ExprStmt":
            return self.eval_expr(node["expr"], env)
        if t == "VarDecl":
            const = node["kind"] == "const"
            for d in node["decls"]:
                val = (self.eval_expr(d["init"], env)
                       if d["init"] is not None else UNDEFINED)
                self._bind_pattern(d["pattern"], val, env, declare=True,
                                   const=const)
            return UNDEFINED
        if t == "FunctionDecl":
            env.declare(node["name"], self._make_function(node, env))
            return UNDEFINED
        if t == "ClassDecl":
            env.declare(node["name"], self._make_class(node, env))
            return UNDEFINED
        if t == "Return":
            val = (self.eval_expr(node["arg"], env)
                   if node["arg"] is not None else UNDEFINED)
            raise _Return(val)
        if t == "If":
            if js_truthy(self.eval_expr(node["test"], env)):
                return self.exec_stmt(node["then"], env)
            if node["else"] is not None:
                return self.exec_stmt(node["else"], env)
            return UNDEFINED
        if t == "Block":
            block_env = Env(env)
            self._hoist(node["body"], block_env)
            for stmt in node["body"]:
                self.exec_stmt(stmt, block_env)
            return UNDEFINED
        if t == "While":
            while js_truthy(self.eval_expr(node["test"], env)):
                try:
                    self.exec_stmt(node["body"], env)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if t == "For":
            loop_env = Env(env)
            if node["init"] is not None:
                self.exec_stmt(node["init"], loop_env)
            while (node["test"] is None
                   or js_truthy(self.eval_expr(node["test"], loop_env))):
                try:
                    self.exec_stmt(node["body"], loop_env)
                except _Break:
                    break
                except _Continue:
                    pass
                if node["update"] is not None:
                    self.eval_expr(node["update"], loop_env)
            return UNDEFINED
        if t == "ForOf":
            iterable = self.eval_expr(node["iter"], env)
            for item in js_iter(iterable):
                it_env = Env(env)
                self._bind_pattern(node["pattern"], item, it_env, declare=True)
                try:
                    self.exec_stmt(node["body"], it_env)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if t == "ForIn":
            obj = self.eval_expr(node["iter"], env)
            keys: list = []
            if isinstance(obj, JSObject):
                keys = list(obj.props.keys())
            elif isinstance(obj, JSArray):
                keys = [str(i) for i in range(len(obj.items))]
            for key in keys:
                it_env = Env(env)
                self._bind_pattern(node["pattern"], key, it_env, declare=True)
                try:
                    self.exec_stmt(node["body"], it_env)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if t == "Break":
            raise _Break()
        if t == "Continue":
            raise _Continue()
        if t == "Throw":
            raise JSError(self.eval_expr(node["arg"], env))
        if t == "Try":
            try:
                try:
                    self.exec_stmt(node["block"], env)
                except JSError as e:
                    if node["handler"] is None:
                        raise
                    h_env = Env(env)
                    if node["param"] is not None:
                        self._bind_pattern(node["param"], e.value, h_env,
                                           declare=True)
                    self.exec_stmt(node["handler"], h_env)
            finally:
                if node["finally"] is not None:
                    self.exec_stmt(node["finally"], env)
            return UNDEFINED
        if t == "Empty":
            return UNDEFINED
        raise AssertionError(f"unknown statement {t}")

    # ---- functions / classes ----

    def _make_function(self, node: dict, env: Env) -> JSFunction:
        return JSFunction(node.get("name"), node["params"], node["body"], env,
                          is_arrow=False, is_async=node.get("async", False))

    def _make_class(self, node: dict, env: Env) -> JSClass:
        methods = {name: self._make_function(fn, env)
                   for name, fn in node["methods"].items()}
        statics = {name: self._make_function(fn, env)
                   for name, fn in node["static"].items()}
        return JSClass(node["name"], methods, statics)

    def _bind_params(self, params: list, args: list, env: Env):
        i = 0
        for p in params:
            if p["t"] == "RestPat":
                env.declare(p["name"], JSArray(list(args[i:])))
                return
            val = args[i] if i < len(args) else UNDEFINED
            self._bind_pattern(p, val, env, declare=True)
            i += 1

    def _bind_pattern(self, pat: dict, value, env: Env, declare: bool,
                      const: bool = False):
        default = pat.get("default")
        if default is not None and value is UNDEFINED:
            value = self.eval_expr(default, env)
        t = pat["t"]
        if t == "IdPat":
            if declare:
                env.declare(pat["name"], value, const=const)
            else:
                env.assign(pat["name"], value)
            return
        if t == "ArrayPat":
            items = list(js_iter(value)) if value not in (UNDEFINED, None) else []
            for idx, elem in enumerate(pat["elements"]):
                if elem is None:
                    continue
                v = items[idx] if idx < len(items) else UNDEFINED
                self._bind_pattern(elem, v, env, declare, const)
            return
        if t == "ObjectPat":
            from . import runtime
            for prop in pat["props"]:
                v = runtime.get_member(self, value, prop["key"])
                self._bind_pattern(prop["target"], v, env, declare, const)
            return
        raise AssertionError(f"unknown pattern {t}")

    # ---- expressions ----

    def eval_expr(self, node: dict, env: Env):
        from . import runtime
        t = node["t"]
        if t == "Num":
            return float(node["value"])
        if t == "Str":
            return node["value"]
        if t == "Bool":
            return node["value"]
        if t == "Null":
            return None
        if t == "Undefined":
            return UNDEFINED
        if t == "Id":
            return env.lookup(node["name"])
        if t == "This":
            return env.lookup("this") if env.has("this") else UNDEFINED
        if t == "Template":
            out = []
            for kind, payload in node["parts"]:
                if kind == "str":
                    out.append(payload)
                else:
                    out.append(js_str(self.eval_expr(payload, env)))
            return "".join(out)
        if t == "ArrayLit":
            items = []
            for elem in node["elements"]:
                if elem["t"] == "Spread":
                    items.extend(js_iter(self.eval_expr(elem["arg"], env)))
                else:
                    items.append(self.eval_expr(elem, env))
            return JSArray(items)
        if t == "ObjectLit":
            obj = JSObject()
            for prop in node["props"]:
                obj.props[prop["key"]] = self.eval_expr(prop["value"], env)
            return obj
        if t == "Arrow":
            this = env.lookup("this") if env.has("this") else UNDEFINED
            return JSFunction(None, node["params"], node["body"], env,
                              is_arrow=True, is_async=node.get("async", False),
                              this_val=this, expr_body=node["exprBody"])
        if t == "FunctionExpr":
            return self._make_function(node, env)
        if t == "ClassExpr":
            return self._make_class(node, env)
        if t == "Member":
            obj = self.eval_expr(node["obj"], env)
            return runtime.get_member(self, obj, node["name"])
        if t == "Index":
            obj = self.eval_expr(node["obj"], env)
            idx = self.eval_expr(node["index"], env)
            return runtime.get_index(self, obj, idx)
        if t == "Call":
            return self._eval_call(node, env)
        if t == "New":
            callee = self.eval_expr(node["callee"], env)
            args = self._eval_args(node["args"], env)
            return self.construct(callee, args)
        if t == "Assign":
            return self._eval_assign(node, env)
        if t == "Update":
            return self._eval_update(node, env)
        if t == "Cond":
            if js_truthy(self.eval_expr(node["test"], env)):
                return self.eval_expr(node["then"], env)
            return self.eval_expr(node["else"], env)
        if t == "Binary":
            return self._eval_binary(node, env)
        if t == "Unary":
            op = node["op"]
            if op == "typeof":
                arg = node["arg"]
                if arg["t"] == "Id" and not env.has(arg["name"]):
                    return "undefined"
                return js_typeof(self.eval_expr(arg, env))
            val = self.eval_expr(node["arg"], env)
            if op == "!":
                return not js_truthy(val)
            if op == "-":
                return -js_num(val)
            if op == "+":
                return js_num(val)
            if op == "~":
                return float(~_to_int32(js_num(val)))
            raise AssertionError(f"unknown unary {op}")
        if t == "Await":
            val = self.eval_expr(node["arg"], env)
            if isinstance(val, JSPromise):
                if val.state == "rejected":
                    raise JSError(val.value)
                return val.value
            return val
        if t == "Sequence":
            result = UNDEFINED
            for e in node["exprs"]:
                result = self.eval_expr(e, env)
            return result
        if t == "Spread":
            raise JSError(make_error("SyntaxError", "unexpected spread"))
        raise AssertionError(f"unknown expression {t}")

    def _eval_args(self, arg_nodes: list, env: Env) -> list:
        args = []
        for a in arg_nodes:
            if a["t"] == "Spread":
                args.extend(js_iter(self.eval_expr(a["arg"], env)))
            else:
                args.append(self.eval_expr(a, env))
        return args

    def _eval_call(self, node: dict, env: Env):
        from . import runtime
        callee = node["callee"]
        if callee["t"] == "Member":
            obj = self.eval_expr(callee["obj"], env)
            fn = runtime.get_member(self, obj, callee["name"])
            this = obj
        elif callee["t"] == "Index":
            obj = self.eval_expr(callee["obj"], env)
            idx = self.eval_expr(callee["index"], env)
            fn = runtime.get_index(self, obj, idx)
            this = obj
        else:
            fn = self.eval_expr(callee, env)
            this = UNDEFINED
        args = self._eval_args(node["args"], env)
        if not isinstance(fn, CALLABLE):
            desc = callee.get("name") or js_str(fn)
            throw_type_error(f"{desc} is not a function")
        return self.call(fn, this, args)

    def _eval_assign(self, node: dict, env: Env):
        from . import runtime
        op = node["op"]
        target = node["target"]
        if op == "=":
            value = self.eval_expr(node["value"], env)
        else:
            current = self.eval_expr(target, env)
            if op in ("&&=", "||=", "??="):
                need = ((op == "&&=" and js_truthy(current))
                        or (op == "||=" and not js_truthy(current))
                        or (op == "??=" and current in (UNDEFINED, None)))
                if not need:
                    return current
                value = self.eval_expr(node["value"], env)
            else:
                rhs = self.eval_expr(node["value"], env)
                value = _apply_binop(op[:-1], current, rhs)
        if target["t"] == "Id":
            env.assign(target["name"], value)
        elif target["t"] == "Member":
            obj = self.eval_expr(target["obj"], env)
            runtime.set_member(self, obj, target["name"], value)
        else:  # Index
            obj = self.eval_expr(target["obj"], env)
            idx = self.eval_expr(target["index"], env)
            runtime.set_index(self, obj, idx, value)
        return value

    def _eval_update(self, node: dict, env: Env):
        from . import runtime
        target = node["arg"]
        old = js_num(self.eval_expr(target, env))
        new = old + (1.0 if node["op"] == "++" else -1.0)
        if target["t"] == "Id":
            env.assign(target["name"], new)
        elif target["t"] == "Member":
            obj = self.eval_expr(target["obj"], env)
            runtime.set_member(self, obj, target["name"], new)
        elif target["t"] == "Index":
            obj = self.eval_expr(target["obj"], env)
            idx = self.eval_expr(target["index"], env)
            runtime.set_index(self, obj, idx, new)
        else:
            throw_type_error("invalid update target")
        return new if node["prefix"] else old

    def _eval_binary(self, node: dict, env: Env):
        op = node["op"]
        if op == "&&":
            left = self.eval_expr(node["left"], env)
            return self.eval_expr(node["right"], env) if js_truthy(left) else left
        if op == "||":
            left = self.eval_expr(node["left"], env)
            return left if js_truthy(left) else self.eval_expr(node["right"], env)
        if op == "??":
            left = self.eval_expr(node["left"], env)
            if left is UNDEFINED or left is None:
                return self.eval_expr(node["right"], env)
            return left
        left = self.eval_expr(node["left"], env)
        right = self.eval_expr(node["right"], env)
        return _apply_binop(op, left, right)


def _to_int32(x: float) -> int:
    if math.isnan(x) or math.isinf(x):
        return 0
    n = int(x) & 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _apply_binop(op: str, left, right):
    if op == "+":
        if isinstance(left, str) or isinstance(right, str):
            return js_str(left) + js_str(right)
        if isinstance(left, (JSArray, JSObject)) or isinstance(right, (JSArray, JSObject)):
            return js_str(left) + js_str(right)
        return js_num(left) + js_num(right)
    if op == "-":
        return js_num(left) - js_num(right)
    if op == "*":
        return js_num(left) * js_num(right)
    if op == "/":
        a, b = js_num(left), js_num(right)
        if b == 0:
            if a == 0 or math.isnan(a):
                return float("nan")
            return math.copysign(float("inf"), a) * math.copysign(1.0, b)
        return a / b
    if op == "%":
        a, b = js_num(left), js_num(right)
        if b == 0 or math.isnan(a) or math.isnan(b) or math.isinf(a):
            return float("nan")
        return math.fmod(a, b)
    if op == "===":
        return strict_eq(left, right)
    if op == "!==":
        return not strict_eq(left, right)
    if op == "==":
        return loose_eq(left, right)
    if op == "!=":
        return not loose_eq(left, right)
    if op in ("&", "|", "^", "<<", ">>", ">>>"):
        a = _to_int32(js_num(left))
        if op == ">>>":
            ua = a & 0xFFFFFFFF
            sh = _to_int32(js_num(right)) & 31
            return float(ua >> sh)
        b = _to_int32(js_num(right))
        if op == "&":
            return float(_to_int32(float(a & b)))
        if op == "|":
            return float(_to_int32(float(a | b)))
        if op == "^":
            return float(_to_int32(float(a ^ b)))
        sh = b & 31
        if op == "<<":
            return float(_to_int32(float((a << sh) & 0xFFFFFFFF)))
        return float(a >> sh)  # '>>' on Python ints is arithmetic already
    if op in ("<", ">", "<=", ">="):
        if isinstance(left, str) and isinstance(right, str):
            a, b = left, right
        else:
            a, b = js_num(left), js_num(right)
            if isinstance(a, float) and (math.isnan(a) or math.isnan(b)):
                return False
        if op == "<":
            return a < b
        if op == ">":
            return a > b
        if op == "<=":
            return a <= b
        return a >= b
    raise AssertionError(f"unknown binary op {op}")
