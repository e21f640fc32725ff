"""Recursive-descent parser for the bounded ES subset.

AST nodes are plain dicts with a ``t`` tag (compact, easy to assert on in
tests).  Anything outside the subset raises JSSyntaxError -- a frontend
edit that outgrows the engine must fail the suite, not silently skip.
"""

from __future__ import annotations

from .lexer import JSSyntaxError, Token, tokenize

ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&&=", "||=", "??=",
              "&=", "|=", "^=", "<<=", ">>=", ">>>="}


def parse(src: str, filename: str = "<js>") -> dict:
    return _Parser(tokenize(src, filename), filename).parse_program()


def parse_tokens(toks: list[Token], filename: str = "<js>") -> dict:
    """Parse an expression from a pre-lexed token list (template ${...})."""
    p = _Parser(toks, filename)
    expr = p.parse_expression()
    p.expect_eof()
    return expr


class _Parser:
    def __init__(self, toks: list[Token], filename: str):
        self.toks = toks
        self.pos = 0
        self.filename = filename

    # ---- token helpers ----

    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.pos + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.pos]
        if t.kind != "eof":
            self.pos += 1
        return t

    def at(self, kind: str, value=None, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t.kind == kind and (value is None or t.value == value)

    def at_punct(self, *values: str) -> bool:
        t = self.peek()
        return t.kind == "punct" and t.value in values

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "keyword" and t.value in words

    def eat(self, kind: str, value=None) -> Token | None:
        if self.at(kind, value):
            return self.next()
        return None

    def expect(self, kind: str, value=None) -> Token:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise self.err(f"expected {value or kind}, got {t.value!r}", t)
        return t

    def expect_eof(self):
        if not self.at("eof"):
            raise self.err(f"unexpected trailing {self.peek().value!r}")

    def err(self, msg: str, tok: Token | None = None) -> JSSyntaxError:
        tok = tok or self.peek()
        return JSSyntaxError(f"{self.filename}:{tok.line}: {msg}")

    # ---- program / statements ----

    def parse_program(self) -> dict:
        body = []
        while not self.at("eof"):
            body.append(self.parse_statement())
        return {"t": "Program", "body": body}

    def parse_statement(self) -> dict:
        if self.at_punct(";"):
            self.next()
            return {"t": "Empty"}
        if self.at_punct("{"):
            return self.parse_block()
        if self.at_kw("const", "let"):
            stmt = self.parse_var_decl()
            self.eat("punct", ";")
            return stmt
        if self.at_kw("async") and self.at("keyword", "function", 1):
            self.next()
            return self.parse_function_decl(is_async=True)
        if self.at_kw("function"):
            return self.parse_function_decl()
        if self.at_kw("class"):
            return self.parse_class_decl()
        if self.at_kw("return"):
            line = self.next().line
            if self.at_punct(";") or self.at_punct("}") or self.at("eof") or self.peek().line > line:
                self.eat("punct", ";")
                return {"t": "Return", "arg": None}
            arg = self.parse_expression()
            self.eat("punct", ";")
            return {"t": "Return", "arg": arg}
        if self.at_kw("if"):
            return self.parse_if()
        if self.at_kw("for"):
            return self.parse_for()
        if self.at_kw("while"):
            self.next()
            self.expect("punct", "(")
            test = self.parse_expression()
            self.expect("punct", ")")
            body = self.parse_statement()
            return {"t": "While", "test": test, "body": body}
        if self.at_kw("break"):
            self.next()
            self.eat("punct", ";")
            return {"t": "Break"}
        if self.at_kw("continue"):
            self.next()
            self.eat("punct", ";")
            return {"t": "Continue"}
        if self.at_kw("try"):
            return self.parse_try()
        if self.at_kw("throw"):
            self.next()
            arg = self.parse_expression()
            self.eat("punct", ";")
            return {"t": "Throw", "arg": arg}
        expr = self.parse_expression()
        self.eat("punct", ";")
        return {"t": "ExprStmt", "expr": expr}

    def parse_block(self) -> dict:
        self.expect("punct", "{")
        body = []
        while not self.at_punct("}"):
            if self.at("eof"):
                raise self.err("unterminated block")
            body.append(self.parse_statement())
        self.next()
        return {"t": "Block", "body": body}

    def parse_var_decl(self) -> dict:
        kind = self.next().value
        decls = []
        while True:
            pattern = self.parse_pattern()
            init = None
            if self.eat("punct", "="):
                init = self.parse_assignment()
            decls.append({"pattern": pattern, "init": init})
            if not self.eat("punct", ","):
                break
        return {"t": "VarDecl", "kind": kind, "decls": decls}

    def parse_function_decl(self, is_async: bool = False) -> dict:
        self.expect("keyword", "function")
        name = self.expect("name").value
        params = self.parse_params()
        body = self.parse_block()
        return {"t": "FunctionDecl", "name": name, "params": params,
                "body": body, "async": is_async}

    def parse_class_decl(self) -> dict:
        self.expect("keyword", "class")
        name = self.expect("name").value
        if self.at_kw("extends"):
            raise self.err("class extends unsupported in jsvm")
        self.expect("punct", "{")
        methods = {}
        static_methods = {}
        while not self.at_punct("}"):
            if self.eat("punct", ";"):
                continue
            is_static = bool(self.eat("keyword", "static"))
            mname_tok = self.next()
            if mname_tok.kind not in ("name", "keyword"):
                raise self.err("expected method name", mname_tok)
            mname = mname_tok.value
            params = self.parse_params()
            body = self.parse_block()
            fn = {"t": "FunctionExpr", "name": mname, "params": params,
                  "body": body, "async": False, "arrow": False}
            (static_methods if is_static else methods)[mname] = fn
        self.next()
        return {"t": "ClassDecl", "name": name, "methods": methods,
                "static": static_methods}

    def parse_if(self) -> dict:
        self.expect("keyword", "if")
        self.expect("punct", "(")
        test = self.parse_expression()
        self.expect("punct", ")")
        then = self.parse_statement()
        alt = None
        if self.at_kw("else"):
            self.next()
            alt = self.parse_statement()
        return {"t": "If", "test": test, "then": then, "else": alt}

    def parse_for(self) -> dict:
        self.expect("keyword", "for")
        self.expect("punct", "(")
        init = None
        if self.at_punct(";"):
            self.next()
        elif self.at_kw("const", "let"):
            decl = self.parse_var_decl()
            if self.at_kw("of", "in"):
                mode = self.next().value
                if len(decl["decls"]) != 1 or decl["decls"][0]["init"] is not None:
                    raise self.err("malformed for-of/in head")
                iterable = self.parse_expression()
                self.expect("punct", ")")
                body = self.parse_statement()
                return {"t": "ForOf" if mode == "of" else "ForIn",
                        "pattern": decl["decls"][0]["pattern"],
                        "iter": iterable, "body": body}
            self.expect("punct", ";")
            init = decl
        else:
            init = {"t": "ExprStmt", "expr": self.parse_expression()}
            self.expect("punct", ";")
        test = None if self.at_punct(";") else self.parse_expression()
        self.expect("punct", ";")
        update = None if self.at_punct(")") else self.parse_expression()
        self.expect("punct", ")")
        body = self.parse_statement()
        return {"t": "For", "init": init, "test": test, "update": update,
                "body": body}

    def parse_try(self) -> dict:
        self.expect("keyword", "try")
        block = self.parse_block()
        handler = None
        param = None
        finalizer = None
        if self.at_kw("catch"):
            self.next()
            if self.eat("punct", "("):
                param = self.parse_pattern()
                self.expect("punct", ")")
            handler = self.parse_block()
        if self.at_kw("finally"):
            self.next()
            finalizer = self.parse_block()
        if handler is None and finalizer is None:
            raise self.err("try without catch/finally")
        return {"t": "Try", "block": block, "param": param,
                "handler": handler, "finally": finalizer}

    # ---- patterns ----

    def parse_pattern(self) -> dict:
        if self.at("name"):
            return {"t": "IdPat", "name": self.next().value}
        if self.at_punct("["):
            self.next()
            elements = []
            while not self.at_punct("]"):
                if self.at_punct(","):
                    elements.append(None)  # hole
                    self.next()
                    continue
                elem = self.parse_pattern_with_default()
                elements.append(elem)
                if not self.at_punct("]"):
                    self.expect("punct", ",")
            self.next()
            return {"t": "ArrayPat", "elements": elements}
        if self.at_punct("{"):
            self.next()
            props = []
            while not self.at_punct("}"):
                key = self.next()
                if key.kind not in ("name", "keyword"):
                    raise self.err("expected property name in pattern", key)
                if self.eat("punct", ":"):
                    target = self.parse_pattern_with_default()
                else:
                    default = None
                    if self.eat("punct", "="):
                        default = self.parse_assignment()
                    target = {"t": "IdPat", "name": key.value,
                              **({"default": default} if default else {})}
                props.append({"key": key.value, "target": target})
                if not self.at_punct("}"):
                    self.expect("punct", ",")
            self.next()
            return {"t": "ObjectPat", "props": props}
        raise self.err(f"unexpected token in pattern: {self.peek().value!r}")

    def parse_pattern_with_default(self) -> dict:
        pat = self.parse_pattern()
        if self.eat("punct", "="):
            pat = dict(pat)
            pat["default"] = self.parse_assignment()
        return pat

    def parse_params(self) -> list[dict]:
        self.expect("punct", "(")
        params = []
        while not self.at_punct(")"):
            if self.eat("punct", "..."):
                params.append({"t": "RestPat",
                               "name": self.expect("name").value})
            else:
                params.append(self.parse_pattern_with_default())
            if not self.at_punct(")"):
                self.expect("punct", ",")
        self.next()
        return params

    # ---- expressions ----

    def parse_expression(self) -> dict:
        expr = self.parse_assignment()
        if self.at_punct(","):
            exprs = [expr]
            while self.eat("punct", ","):
                exprs.append(self.parse_assignment())
            return {"t": "Sequence", "exprs": exprs}
        return expr

    def parse_assignment(self) -> dict:
        arrow = self.try_parse_arrow()
        if arrow is not None:
            return arrow
        left = self.parse_conditional()
        if self.peek().kind == "punct" and self.peek().value in ASSIGN_OPS:
            op = self.next().value
            right = self.parse_assignment()
            if left["t"] not in ("Id", "Member", "Index"):
                raise self.err("invalid assignment target")
            return {"t": "Assign", "op": op, "target": left, "value": right}
        return left

    def try_parse_arrow(self) -> dict | None:
        """Detect `x =>`, `(a, b) =>`, `async (...) =>` without committing."""
        start = self.pos
        is_async = False
        if self.at_kw("async") and (self.at("name", None, 1) or self.at("punct", "(", 1)):
            # only treat as async-arrow prefix if an arrow actually follows
            probe = self.pos
            self.next()
            res = self._arrow_after_async()
            if res is not None:
                res["async"] = True
                return res
            self.pos = probe
            return None
        return self._arrow_after_async()

    def _arrow_after_async(self) -> dict | None:
        start = self.pos
        if self.at("name") and self.at("punct", "=>", 1):
            name = self.next().value
            self.next()
            return self._finish_arrow([{"t": "IdPat", "name": name}])
        if self.at_punct("("):
            # scan to matching ')' and look for '=>'
            depth = 0
            j = self.pos
            while j < len(self.toks):
                t = self.toks[j]
                if t.kind == "punct" and t.value == "(":
                    depth += 1
                elif t.kind == "punct" and t.value == ")":
                    depth -= 1
                    if depth == 0:
                        break
                elif t.kind == "eof":
                    break
                j += 1
            nxt = self.toks[min(j + 1, len(self.toks) - 1)]
            if nxt.kind == "punct" and nxt.value == "=>":
                params = self.parse_params()
                self.expect("punct", "=>")
                return self._finish_arrow(params)
        self.pos = start
        return None

    def _finish_arrow(self, params: list[dict]) -> dict:
        if self.at_punct("{"):
            body = self.parse_block()
            expr_body = False
        else:
            body = self.parse_assignment()
            expr_body = True
        return {"t": "Arrow", "params": params, "body": body,
                "exprBody": expr_body, "async": False}

    def parse_conditional(self) -> dict:
        test = self.parse_nullish()
        if self.eat("punct", "?"):
            then = self.parse_assignment()
            self.expect("punct", ":")
            alt = self.parse_assignment()
            return {"t": "Cond", "test": test, "then": then, "else": alt}
        return test

    def _binary(self, sub, ops: tuple[str, ...]) -> dict:
        left = sub()
        while self.peek().kind == "punct" and self.peek().value in ops:
            op = self.next().value
            right = sub()
            left = {"t": "Binary", "op": op, "left": left, "right": right}
        return left

    def parse_nullish(self) -> dict:
        return self._binary(self.parse_or, ("??",))

    def parse_or(self) -> dict:
        return self._binary(self.parse_and, ("||",))

    def parse_and(self) -> dict:
        return self._binary(self.parse_bitor, ("&&",))

    def parse_bitor(self) -> dict:
        return self._binary(self.parse_bitxor, ("|",))

    def parse_bitxor(self) -> dict:
        return self._binary(self.parse_bitand, ("^",))

    def parse_bitand(self) -> dict:
        return self._binary(self.parse_equality, ("&",))

    def parse_equality(self) -> dict:
        return self._binary(self.parse_relational, ("===", "!==", "==", "!="))

    def parse_relational(self) -> dict:
        return self._binary(self.parse_shift, ("<", ">", "<=", ">="))

    def parse_shift(self) -> dict:
        return self._binary(self.parse_additive, ("<<", ">>", ">>>"))

    def parse_additive(self) -> dict:
        return self._binary(self.parse_multiplicative, ("+", "-"))

    def parse_multiplicative(self) -> dict:
        return self._binary(self.parse_unary, ("*", "/", "%"))

    def parse_unary(self) -> dict:
        if self.at_punct("!", "-", "+", "~"):
            op = self.next().value
            return {"t": "Unary", "op": op, "arg": self.parse_unary()}
        if self.at_kw("typeof"):
            self.next()
            return {"t": "Unary", "op": "typeof", "arg": self.parse_unary()}
        if self.at_kw("await"):
            self.next()
            return {"t": "Await", "arg": self.parse_unary()}
        if self.at_punct("++", "--"):
            op = self.next().value
            arg = self.parse_unary()
            return {"t": "Update", "op": op, "prefix": True, "arg": arg}
        return self.parse_postfix()

    def parse_postfix(self) -> dict:
        expr = self.parse_call_member()
        if self.at_punct("++", "--"):
            op = self.next().value
            return {"t": "Update", "op": op, "prefix": False, "arg": expr}
        return expr

    def parse_call_member(self) -> dict:
        if self.at_kw("new"):
            self.next()
            callee = self.parse_member_only(self.parse_primary())
            args = self.parse_args() if self.at_punct("(") else []
            expr = {"t": "New", "callee": callee, "args": args}
            return self.parse_call_tail(expr)
        return self.parse_call_tail(self.parse_primary())

    def parse_member_only(self, expr: dict) -> dict:
        """Member accesses only (no calls) -- for `new X.Y(...)` callees."""
        while True:
            if self.at_punct("."):
                self.next()
                name = self.next()
                if name.kind not in ("name", "keyword"):
                    raise self.err("expected property name", name)
                expr = {"t": "Member", "obj": expr, "name": name.value}
            elif self.at_punct("["):
                self.next()
                idx = self.parse_expression()
                self.expect("punct", "]")
                expr = {"t": "Index", "obj": expr, "index": idx}
            else:
                return expr

    def parse_call_tail(self, expr: dict) -> dict:
        while True:
            if self.at_punct("."):
                self.next()
                name = self.next()
                if name.kind not in ("name", "keyword"):
                    raise self.err("expected property name", name)
                expr = {"t": "Member", "obj": expr, "name": name.value}
            elif self.at_punct("["):
                self.next()
                idx = self.parse_expression()
                self.expect("punct", "]")
                expr = {"t": "Index", "obj": expr, "index": idx}
            elif self.at_punct("("):
                expr = {"t": "Call", "callee": expr, "args": self.parse_args()}
            else:
                return expr

    def parse_args(self) -> list[dict]:
        self.expect("punct", "(")
        args = []
        while not self.at_punct(")"):
            if self.eat("punct", "..."):
                args.append({"t": "Spread", "arg": self.parse_assignment()})
            else:
                args.append(self.parse_assignment())
            if not self.at_punct(")"):
                self.expect("punct", ",")
        self.next()
        return args

    def parse_primary(self) -> dict:
        t = self.peek()
        if t.kind == "num":
            self.next()
            return {"t": "Num", "value": t.value}
        if t.kind == "str":
            self.next()
            return {"t": "Str", "value": t.value}
        if t.kind == "template":
            self.next()
            parts = []
            for kind, payload in t.value:
                if kind == "str":
                    parts.append(("str", payload))
                else:
                    parts.append(("expr", parse_tokens(payload, self.filename)))
            return {"t": "Template", "parts": parts}
        if t.kind == "name":
            self.next()
            return {"t": "Id", "name": t.value}
        if t.kind == "keyword":
            kw = t.value
            if kw in ("true", "false"):
                self.next()
                return {"t": "Bool", "value": kw == "true"}
            if kw == "null":
                self.next()
                return {"t": "Null"}
            if kw == "undefined":
                self.next()
                return {"t": "Undefined"}
            if kw == "this":
                self.next()
                return {"t": "This"}
            if kw == "function":
                self.next()
                name = self.eat("name")
                params = self.parse_params()
                body = self.parse_block()
                return {"t": "FunctionExpr", "name": name.value if name else None,
                        "params": params, "body": body, "async": False,
                        "arrow": False}
            if kw == "async" and self.at("keyword", "function", 1):
                self.next()
                self.next()
                name = self.eat("name")
                params = self.parse_params()
                body = self.parse_block()
                return {"t": "FunctionExpr", "name": name.value if name else None,
                        "params": params, "body": body, "async": True,
                        "arrow": False}
            if kw == "class":
                decl = self.parse_class_decl()
                decl = dict(decl)
                decl["t"] = "ClassExpr"
                return decl
            if kw == "of":  # `of` is contextual; as a primary it's a name
                self.next()
                return {"t": "Id", "name": "of"}
            raise self.err(f"unexpected keyword {kw!r}")
        if t.kind == "punct" and t.value == "(":
            self.next()
            expr = self.parse_expression()
            self.expect("punct", ")")
            return expr
        if t.kind == "punct" and t.value == "[":
            self.next()
            elements = []
            while not self.at_punct("]"):
                if self.eat("punct", "..."):
                    elements.append({"t": "Spread", "arg": self.parse_assignment()})
                else:
                    elements.append(self.parse_assignment())
                if not self.at_punct("]"):
                    self.expect("punct", ",")
            self.next()
            return {"t": "ArrayLit", "elements": elements}
        if t.kind == "punct" and t.value == "{":
            self.next()
            props = []
            while not self.at_punct("}"):
                key_tok = self.next()
                if key_tok.kind in ("name", "keyword"):
                    key = key_tok.value
                elif key_tok.kind == "str":
                    key = key_tok.value
                elif key_tok.kind == "num":
                    key = _num_key(key_tok.value)
                else:
                    raise self.err("expected property key", key_tok)
                if self.at_punct("("):
                    params = self.parse_params()
                    body = self.parse_block()
                    value = {"t": "FunctionExpr", "name": key, "params": params,
                             "body": body, "async": False, "arrow": False}
                elif self.eat("punct", ":"):
                    value = self.parse_assignment()
                else:
                    value = {"t": "Id", "name": key}
                props.append({"key": key, "value": value})
                if not self.at_punct("}"):
                    self.expect("punct", ",")
            self.next()
            return {"t": "ObjectLit", "props": props}
        raise self.err(f"unexpected token {t.value!r}")


def _num_key(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(v)
