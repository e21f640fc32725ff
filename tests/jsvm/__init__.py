"""Minimal embedded JavaScript engine for executing the dashboard frontend in CI.

The image ships no JS runtime (no node/bun/quickjs), so the dashboard's
JS has only ever been checked statically (tests/js_semantics.py).  This
package is the "minimal embedded engine" option: a tokenizer + recursive
-descent parser + tree-walking evaluator for the bounded modern-ES subset
the frontend actually uses (const/let, arrow functions, classes, template
literals, destructuring with holes and defaults, spread in calls/arrays,
Map/Set, async/await over synchronously-resolving stub promises), plus a
DOM/browser stub with a real HTML parser so `innerHTML` round-trips and
`querySelectorAll` works over generated markup.

It is test infrastructure: the goal is to execute
realtime_analytics_tpu/api/static/*.js against recorded snapshots/events
and assert the rendered DOM -- catching the runtime TypeErrors that
static analysis cannot (counterpart of executing the reference frontend,
/root/reference/src/realtime_analytics/api/static/main.js:517-560, in a
browser).

Deliberately NOT a general JS engine: unsupported syntax raises
JSSyntaxError at parse time (loudly, so frontend edits that outgrow the
subset fail the suite rather than silently skipping).
"""

from .lexer import JSSyntaxError, tokenize
from .jsparser import parse
from .interp import Interpreter, JSError
from .harness import Page

__all__ = [
    "tokenize", "parse", "Interpreter", "JSError", "JSSyntaxError", "Page",
]
