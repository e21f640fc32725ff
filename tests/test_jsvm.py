"""Language-semantics tests for the embedded JS engine (tests/jsvm).

The engine exists to execute the dashboard frontend in CI (see
test_frontend_execution.py); these tests pin the language subset itself
so engine regressions surface independent of the frontend."""

import math

import pytest

from tests.jsvm import Interpreter, JSError, JSSyntaxError
from tests.jsvm.interp import UNDEFINED, JSArray, JSObject


def run(src):
    return Interpreter().run_script(src)


class TestExpressions:
    def test_arithmetic_and_precedence(self):
        assert run("1 + 2 * 3 - 4 / 2;") == 5.0
        assert run("(1 + 2) * 3;") == 9.0
        assert run("7 % 3;") == 1.0
        assert run("-7 % 3;") == -1.0  # JS remainder keeps dividend sign

    def test_division_by_zero(self):
        assert run("1 / 0;") == math.inf
        assert run("-1 / 0;") == -math.inf
        assert math.isnan(run("0 / 0;"))

    def test_string_concat_and_coercion(self):
        assert run("'a' + 1;") == "a1"
        assert run("1 + '2';") == "12"
        assert run("'' + true;") == "true"
        assert run("'' + [1, 2];") == "1,2"
        assert run("'' + {};") == "[object Object]"
        assert run("'5' * 2;") == 10.0

    def test_equality(self):
        assert run("1 === 1;") is True
        assert run("1 == '1';") is True
        assert run("1 === '1';") is False
        assert run("null == undefined;") is True
        assert run("null === undefined;") is False
        assert run("NaN === NaN;") is False

    def test_logical_operators_return_values(self):
        assert run("0 || 'fallback';") == "fallback"
        assert run("'x' && 'y';") == "y"
        assert run("null ?? 'dflt';") == "dflt"
        assert run("0 ?? 'dflt';") == 0.0  # ?? only trips on null/undefined

    def test_ternary_chain(self):
        src = "const f = (x) => x > 10 ? 'big' : x > 5 ? 'mid' : 'small'; f(7);"
        assert run(src) == "mid"

    def test_template_literals(self):
        assert run("const a = 3; `v=${a + 1} ${'s'}`;") == "v=4 s"
        assert run("`${[1,2].map((x) => x * 2).join('+')}`;") == "2+4"

    def test_typeof(self):
        assert run("typeof 1;") == "number"
        assert run("typeof 'x';") == "string"
        assert run("typeof undefined;") == "undefined"
        assert run("typeof missingGlobal;") == "undefined"
        assert run("typeof null;") == "object"
        assert run("typeof (() => 0);") == "function"

    def test_bit_ops(self):
        assert run("(5 | 2);") == 7.0
        assert run("(5 & 3);") == 1.0
        assert run("(5 ^ 1);") == 4.0
        assert run("(1 << 4);") == 16.0
        assert run("(-8 >> 1);") == -4.0
        assert run("(-1 >>> 0);") == 4294967295.0
        assert run("(0x10);") == 16.0

    def test_update_expressions(self):
        assert run("let i = 1; i++; i;") == 2.0
        assert run("let i = 1; const j = i++; j;") == 1.0
        assert run("let i = 1; const j = ++i; j;") == 2.0


class TestBindingAndScope:
    def test_destructuring(self):
        assert run("const [a, , c] = [1, 2, 3]; a + c;") == 4.0
        assert run("const { x, y: z = 9 } = { x: 1 }; x + z;") == 10.0
        assert run("const f = ([, v]) => v; f(['k', 7]);") == 7.0
        assert run("const f = ({ w: a, h: b }) => a * b; f({ w: 3, h: 4 });") == 12.0

    def test_default_params(self):
        assert run("function f(a, b = 10) { return a + b; } f(1);") == 11.0
        assert run("function f(a, b = 10) { return a + b; } f(1, 2);") == 3.0

    def test_rest_params_and_spread(self):
        assert run("function f(...xs) { return xs.length; } f(1, 2, 3);") == 3.0
        assert run("Math.max(0, ...[3, 9, 4]);") == 9.0
        assert run("[...[1, 2], 3].join('');") == "123"

    def test_closures(self):
        src = """
        function counter() { let n = 0; return () => { n += 1; return n; }; }
        const c = counter(); c(); c(); c();
        """
        assert run(src) == 3.0

    def test_const_reassignment_throws(self):
        with pytest.raises(JSError, match="constant"):
            run("const a = 1; a = 2;")

    def test_block_scoping(self):
        assert run("let x = 1; { let x = 2; } x;") == 1.0

    def test_function_hoisting(self):
        assert run("const v = f(); function f() { return 42; } v;") == 42.0


class TestControlFlow:
    def test_for_loops(self):
        assert run("let s = 0; for (let i = 0; i < 5; i++) s += i; s;") == 10.0
        assert run("let s = 0; for (const x of [1, 2, 3]) s += x; s;") == 6.0
        assert run(
            "let ks = ''; for (const k in { a: 1, b: 2 }) ks += k; ks;") == "ab"

    def test_break_continue(self):
        src = "let s = 0; for (let i = 0; i < 10; i++) { if (i === 2) continue; if (i === 5) break; s += i; } s;"
        assert run(src) == 0 + 1 + 3 + 4

    def test_while(self):
        assert run("let n = 0; while (n < 4) n++; n;") == 4.0

    def test_try_catch_finally(self):
        assert run("let r = 0; try { throw 5; } catch (e) { r = e; } r;") == 5.0
        assert run("let r = 0; try { noSuchFn(); } catch { r = 1; } r;") == 1.0
        assert run(
            "let log = ''; try { log += 'a'; } finally { log += 'b'; } log;") == "ab"

    def test_uncaught_throw_propagates(self):
        with pytest.raises(JSError):
            run("undefinedFn();")
        with pytest.raises(JSError, match="reading 'x'"):
            run("const o = undefined; o.x;")


class TestClasses:
    SRC = """
    class Ring {
      constructor(cap) { this.cap = cap; this.items = []; }
      push(v) {
        this.items.push(v);
        if (this.items.length > this.cap) this.items.shift();
        return this;
      }
      sum() { return this.items.reduce((a, b) => a + b, 0); }
      static label() { return 'ring'; }
    }
    """

    def test_instance_methods_and_this(self):
        assert run(self.SRC + "new Ring(2).push(1).push(2).push(3).sum();") == 5.0

    def test_static_methods(self):
        assert run(self.SRC + "Ring.label();") == "ring"

    def test_method_extraction_keeps_this_via_arrow(self):
        src = self.SRC + """
        const r = new Ring(9);
        [1, 2, 3].forEach((v) => r.push(v));
        r.sum();
        """
        assert run(src) == 6.0


class TestStdlib:
    def test_array_methods(self):
        assert run("[3, 1, 2].sort((a, b) => a - b).join('');") == "123"
        assert run("['b', 'a'].sort().join('');") == "ab"
        assert run("[1, 2, 3, 4].filter((x) => x % 2 === 0).length;") == 2.0
        assert run("[[1, 2], [3]].flatMap((x) => x).length;") == 3.0
        assert run("[1, 2, 3].includes(2);") is True
        assert run("[1, 2, 3].indexOf(9);") == -1.0
        assert run("const a = [1, 2, 3, 4]; a.splice(1, 2); a.join('');") == "14"
        assert run("[5, 6].every((x) => x > 4);") is True
        assert run("new Array(3).fill(7).join('');") == "777"
        assert run("Array.from({ length: 3 }, (_, i) => i * 2).join('');") == "024"

    def test_string_methods(self):
        assert run("'AbC'.toLowerCase();") == "abc"
        assert run("'hello'.includes('ell');") is True
        assert run("'7'.padStart(3, '0');") == "007"
        assert run("'a<b'.replaceAll('<', '&lt;');") == "a&lt;b"
        assert run("'data:image/x'.startsWith('data:image/');") is True
        assert run("'abcdef'.slice(1, -1);") == "bcde"

    def test_number_methods(self):
        assert run("(3.14159).toFixed(2);") == "3.14"
        assert run("(1234567).toLocaleString();") == "1,234,567"
        assert run("Number('12.5');") == 12.5
        assert math.isnan(run("Number('nope');"))

    def test_map_set(self):
        src = """
        const m = new Map([['a', 1]]);
        m.set('b', 2);
        const total = [...m.values()].reduce((a, b) => a + b, 0);
        const s = new Set([1, 1, 2]);
        `${m.size},${total},${s.size},${s.has(2)}`;
        """
        assert run(src) == "2,3,2,true"

    def test_map_iteration_order_and_entries(self):
        src = """
        const m = new Map();
        m.set('z', 1); m.set('a', 2);
        [...m.entries()].map(([k, v]) => `${k}${v}`).join('');
        """
        assert run(src) == "z1a2"

    def test_json_roundtrip(self):
        import json
        src = """
        const o = JSON.parse('{"a": [1, 2], "b": "x"}');
        JSON.stringify({ n: o.a.length, b: o.b });
        """
        assert json.loads(run(src)) == {"n": 2, "b": "x"}

    def test_json_parse_failure_throws(self):
        with pytest.raises(JSError):
            run("JSON.parse('{nope');")

    def test_math(self):
        assert run("Math.round(2.5);") == 3.0
        assert run("Math.round(-2.5);") == -2.0  # JS half-up, not banker's
        assert run("Math.floor(-1.5);") == -2.0
        assert run("Math.max();") == -math.inf
        assert run("Math.imul(0xffffffff, 5);") == -5.0

    def test_date(self):
        src = "Date.parse('2025-12-17T19:33:20.000Z');"
        assert run(src) == 1766000000000.0
        assert math.isnan(run("Date.parse('garbage');"))
        assert run("new Date(1766000000000).toISOString();") == \
            "2025-12-17T19:33:20.000Z"

    def test_object_statics(self):
        assert run("Object.keys({ a: 1, b: 2 }).join('');") == "ab"
        assert run(
            "Object.entries({ a: 1 }).map(([k, v]) => k + v).join('');") == "a1"

    def test_async_await_sync_promises(self):
        src = """
        async function f() { return 5; }
        let out = 0;
        async function g() { out = (await f()) + 1; }
        g();
        out;
        """
        assert run(src) == 6.0

    def test_rejected_promise_throws_at_await(self):
        src = """
        let caught = '';
        async function g() {
          try { await Promise.reject('boom'); } catch (e) { caught = e; }
        }
        g();
        caught;
        """
        assert run(src) == "boom"


class TestSubsetBoundaries:
    """Unsupported syntax must fail loudly at parse time."""

    def test_regex_literal_rejected(self):
        with pytest.raises(JSSyntaxError):
            run("const re = /a+/; re;")

    def test_generator_rejected(self):
        with pytest.raises(JSSyntaxError):
            run("function* g() { yield 1; }")

    def test_class_extends_rejected(self):
        with pytest.raises(JSSyntaxError, match="extends"):
            run("class A {} class B extends A {}")

    def test_unterminated_template_rejected(self):
        with pytest.raises(JSSyntaxError):
            run("const s = `oops;")
