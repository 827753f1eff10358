"""Lua script compatibility: load reference ``*.lua`` logtrics scripts.

The reference's rule language is Lua (/root/reference/script.go:23-36
evaluates the file with a ``logtrics`` global; /root/reference/logtrics.go
:31-69 parses each ``logtrics{...}`` table; :162-173 binds the logging +
``graphite()`` APIs into the handler's state).  This module lets a user
point the engine at their existing scripts unchanged: a small
from-scratch interpreter for the Lua 5.1 SUBSET those scripts use —
locals, functions, table constructors, if/while/numeric-for, the full
operator set, string concat, and the stdlib calls seen in real rules
(``tonumber tostring type string.format string.upper/lower/len/sub
math.floor/ceil/abs/min/max/random``) — plus the logtrics bindings:

* ``logtrics{ name=, parser={type="re2", expression=}, handler=fn }``
  registers a rule; the handler becomes the engine's per-row escape
  hatch (`RuleSpec.handler`), running the Lua body per matched event.
* ``graphite().counter(n).inc(v)/.dec(v)``, ``.timer(n).update(v)``,
  ``.gauge(n).update(v)``, ``.meter(n).mark(v)`` record metric emissions
  (/root/reference/graphite/graphite.go:101-151) which the extractor
  turns into points — same columnar downstream as declarative emits.
* ``fatal error warn info debug trace`` map onto the per-rule
  ``RuleLogger`` with Go-style ``%v`` verbs rendered like the
  reference's table printer (/root/reference/logtrics.go:203-227).

Determinism note: ``math.random`` (used by the reference's example
handler) is seeded per (rule, line) — identical reruns on any partition
layout emit identical points, unlike a wall-clock/global-state RNG.

Anything outside the subset fails AT LOAD TIME with a line-numbered
error — strict like the reference's fatal config parse, never silently
wrong at runtime.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class LuaError(ValueError):
    pass


# ------------------------------------------------------------ tokenizer --

_KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for",
    "function", "if", "in", "local", "nil", "not", "or", "repeat",
    "return", "then", "true", "until", "while",
}

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<longcomment>--\[(?P<ceq>=*)\[.*?\](?P=ceq)\])
  | (?P<comment>--[^\n]*)
  | (?P<name>[A-Za-z_]\w*)
  | (?P<number>0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
  | (?P<longstr>\[(?P<seq>=*)\[.*?\](?P=seq)\])
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<op>\.\.\.|\.\.|==|~=|<=|>=|[-+*/%^#<>=(){}\[\];:,.])
""", re.VERBOSE | re.DOTALL)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b",
            "f": "\f", "v": "\v", "\\": "\\", '"': '"', "'": "'",
            "\n": "\n"}


@dataclass
class Tok:
    kind: str       # name | keyword | number | string | op | eof
    value: str
    line: int


def _unescape(s: str, line: int) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            i += 1
            e = s[i]
            if e.isdigit():
                j = i
                while j < len(s) and j - i < 3 and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i:j])))
                i = j
                continue
            if e not in _ESCAPES:
                raise LuaError(f"line {line}: unsupported escape \\{e}")
            out.append(_ESCAPES[e])
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    pos, line = 0, 1
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise LuaError(f"line {line}: unexpected character {src[pos]!r}")
        text = m.group(0)
        if m.lastgroup in ("ws", "comment", "longcomment"):
            pass
        elif m.lastgroup == "name":
            toks.append(Tok("keyword" if text in _KEYWORDS else "name",
                            text, line))
        elif m.lastgroup == "number":
            toks.append(Tok("number", text, line))
        elif m.lastgroup == "string":
            toks.append(Tok("string", _unescape(text[1:-1], line), line))
        elif m.lastgroup == "longstr":
            body = text[text.index("[", 1) + 1:]
            toks.append(Tok("string", body[:body.rindex("]", 0, -1)], line))
        else:
            toks.append(Tok("op", text, line))
        line += text.count("\n")
        pos = m.end()
    toks.append(Tok("eof", "<eof>", line))
    return toks


# --------------------------------------------------------------- parser --
# AST nodes are plain tuples; first element is the node kind.

_BINPRI = {  # (left, right) binding powers; ".." and "^" are right-assoc
    "or": (1, 1), "and": (2, 2),
    "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3),
    "~=": (3, 3), "==": (3, 3),
    "..": (9, 8), "+": (10, 10), "-": (10, 10),
    "*": (11, 11), "/": (11, 11), "%": (11, 11),
    "^": (14, 13),
}
_UNARY_PRI = 12


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def check(self, kind: str, value: str | None = None) -> bool:
        t = self.peek()
        return t.kind == kind and (value is None or t.value == value)

    def accept(self, kind: str, value: str | None = None) -> Tok | None:
        if self.check(kind, value):
            return self.next()
        return None

    def expect(self, kind: str, value: str | None = None) -> Tok:
        t = self.peek()
        if not self.check(kind, value):
            raise LuaError(f"line {t.line}: expected "
                           f"{value or kind}, got {t.value!r}")
        return self.next()

    def fail(self, what: str):
        t = self.peek()
        raise LuaError(f"line {t.line}: unsupported Lua ({what}, "
                       f"near {t.value!r})")

    # blocks -------------------------------------------------------------
    def parse_chunk(self) -> list:
        block = self.parse_block()
        self.expect("eof")
        return block

    _BLOCK_END = {"end", "else", "elseif", "until"}

    def parse_block(self) -> list:
        stmts = []
        while True:
            t = self.peek()
            if t.kind == "eof" or (t.kind == "keyword"
                                   and t.value in self._BLOCK_END):
                return stmts
            if t.kind == "keyword" and t.value == "return":
                self.next()
                exprs = []
                if not (self.peek().kind == "eof"
                        or (self.peek().kind == "keyword"
                            and self.peek().value in self._BLOCK_END)):
                    exprs = self.parse_exprlist()
                self.accept("op", ";")
                stmts.append(("return", exprs))
                return stmts
            stmts.append(self.parse_statement())

    def parse_statement(self):
        if self.accept("op", ";"):
            return ("nop",)
        t = self.peek()
        if t.kind == "keyword":
            if t.value == "local":
                self.next()
                if self.check("keyword", "function"):
                    self.next()
                    name = self.expect("name").value
                    fn = self.parse_funcbody()
                    return ("local", [name], [fn])
                names = [self.expect("name").value]
                while self.accept("op", ","):
                    names.append(self.expect("name").value)
                exprs = []
                if self.accept("op", "="):
                    exprs = self.parse_exprlist()
                return ("local", names, exprs)
            if t.value == "if":
                self.next()
                arms = []
                cond = self.parse_expr()
                self.expect("keyword", "then")
                arms.append((cond, self.parse_block()))
                els: list = []
                while True:
                    if self.accept("keyword", "elseif"):
                        c = self.parse_expr()
                        self.expect("keyword", "then")
                        arms.append((c, self.parse_block()))
                        continue
                    if self.accept("keyword", "else"):
                        els = self.parse_block()
                    self.expect("keyword", "end")
                    break
                return ("if", arms, els)
            if t.value == "while":
                self.next()
                cond = self.parse_expr()
                self.expect("keyword", "do")
                body = self.parse_block()
                self.expect("keyword", "end")
                return ("while", cond, body)
            if t.value == "for":
                self.next()
                name = self.expect("name").value
                if not self.accept("op", "="):
                    self.fail("generic for (pairs/ipairs) not supported")
                start = self.parse_expr()
                self.expect("op", ",")
                stop = self.parse_expr()
                step = None
                if self.accept("op", ","):
                    step = self.parse_expr()
                self.expect("keyword", "do")
                body = self.parse_block()
                self.expect("keyword", "end")
                return ("fornum", name, start, stop, step, body)
            if t.value == "break":
                self.next()
                return ("break",)
            if t.value == "do":
                self.next()
                body = self.parse_block()
                self.expect("keyword", "end")
                return ("do", body)
            if t.value == "function":
                self.next()
                target = ("name", self.expect("name").value)
                while self.accept("op", "."):
                    target = ("index", target,
                              ("str", self.expect("name").value))
                fn = self.parse_funcbody()
                return ("assign", [target], [fn])
            self.fail(f"statement {t.value!r}")
        # expression statement: call, or assignment
        e = self.parse_prefixexpr()
        if self.check("op", "=") or self.check("op", ","):
            targets = [e]
            while self.accept("op", ","):
                targets.append(self.parse_prefixexpr())
            self.expect("op", "=")
            exprs = self.parse_exprlist()
            for tg in targets:
                if tg[0] not in ("name", "index"):
                    self.fail("assignment target")
            return ("assign", targets, exprs)
        if e[0] not in ("call", "method"):
            self.fail("expression is not a statement")
        return ("callstat", e)

    # expressions --------------------------------------------------------
    def parse_exprlist(self) -> list:
        out = [self.parse_expr()]
        while self.accept("op", ","):
            out.append(self.parse_expr())
        return out

    def parse_expr(self, limit: int = 0):
        t = self.peek()
        if t.kind == "keyword" and t.value == "not":
            self.next()
            left = ("unop", "not", self.parse_expr(_UNARY_PRI))
        elif t.kind == "op" and t.value == "-":
            self.next()
            left = ("unop", "-", self.parse_expr(_UNARY_PRI))
        elif t.kind == "op" and t.value == "#":
            self.next()
            left = ("unop", "#", self.parse_expr(_UNARY_PRI))
        else:
            left = self.parse_simpleexpr()
        while True:
            t = self.peek()
            op = t.value if (t.kind == "op" or (t.kind == "keyword"
                             and t.value in ("and", "or"))) else None
            pri = _BINPRI.get(op)
            if pri is None or pri[0] <= limit:
                return left
            self.next()
            right = self.parse_expr(pri[1])
            left = ("binop", op, left, right)

    def parse_simpleexpr(self):
        t = self.peek()
        if t.kind == "number":
            self.next()
            v = (float(int(t.value, 16)) if t.value[:2].lower() == "0x"
                 else float(t.value))
            return ("num", v)
        if t.kind == "string":
            self.next()
            return ("str", t.value)
        if t.kind == "keyword":
            if t.value == "nil":
                self.next(); return ("nil",)
            if t.value == "true":
                self.next(); return ("true",)
            if t.value == "false":
                self.next(); return ("false",)
            if t.value == "function":
                self.next()
                return self.parse_funcbody()
        if t.kind == "op" and t.value == "{":
            return self.parse_table()
        if t.kind == "op" and t.value == "...":
            self.fail("varargs")
        return self.parse_prefixexpr()

    def parse_funcbody(self):
        self.expect("op", "(")
        params = []
        if not self.check("op", ")"):
            while True:
                if self.check("op", "..."):
                    self.fail("vararg parameters")
                params.append(self.expect("name").value)
                if not self.accept("op", ","):
                    break
        self.expect("op", ")")
        body = self.parse_block()
        self.expect("keyword", "end")
        return ("func", params, body)

    def parse_table(self):
        self.expect("op", "{")
        items = []
        while not self.check("op", "}"):
            if self.check("op", "["):
                self.next()
                k = self.parse_expr()
                self.expect("op", "]")
                self.expect("op", "=")
                items.append(("kv", k, self.parse_expr()))
            elif (self.peek().kind == "name"
                  and self.toks[self.i + 1].kind == "op"
                  and self.toks[self.i + 1].value == "="):
                k = self.next().value
                self.next()
                items.append(("kv", ("str", k), self.parse_expr()))
            else:
                items.append(("pos", self.parse_expr()))
            if not (self.accept("op", ",") or self.accept("op", ";")):
                break
        self.expect("op", "}")
        return ("table", items)

    def parse_prefixexpr(self):
        t = self.peek()
        if t.kind == "name":
            self.next()
            e = ("name", t.value)
        elif t.kind == "op" and t.value == "(":
            self.next()
            e = self.parse_expr()
            self.expect("op", ")")
        else:
            self.fail("expression")
        while True:
            t = self.peek()
            if t.kind == "op" and t.value == ".":
                self.next()
                e = ("index", e, ("str", self.expect("name").value))
            elif t.kind == "op" and t.value == "[":
                self.next()
                k = self.parse_expr()
                self.expect("op", "]")
                e = ("index", e, k)
            elif t.kind == "op" and t.value == "(":
                self.next()
                args = [] if self.check("op", ")") else self.parse_exprlist()
                self.expect("op", ")")
                e = ("call", e, args)
            elif t.kind == "op" and t.value == "{":
                e = ("call", e, [self.parse_table()])
            elif t.kind == "string":
                self.next()
                e = ("call", e, [("str", t.value)])
            elif t.kind == "op" and t.value == ":":
                self.next()
                name = self.expect("name").value
                if self.check("op", "("):
                    self.next()
                    args = ([] if self.check("op", ")")
                            else self.parse_exprlist())
                    self.expect("op", ")")
                elif self.check("op", "{"):
                    args = [self.parse_table()]
                elif self.peek().kind == "string":
                    args = [("str", self.next().value)]
                else:
                    self.fail("method call arguments")
                e = ("method", e, name, args)
            else:
                return e


# ---------------------------------------------------------- interpreter --

class LuaTable:
    """Minimal Lua table: one dict; positional constructor entries get
    1-based float keys like real Lua."""

    __slots__ = ("d",)

    def __init__(self, d: dict | None = None):
        self.d = d or {}

    def get(self, k):
        return self.d.get(_normkey(k))

    def set(self, k, v):
        k = _normkey(k)
        if v is None:
            self.d.pop(k, None)
        else:
            self.d[k] = v

    def __len__(self):
        n = 0
        while (n + 1) in self.d or float(n + 1) in self.d:
            n += 1
        return n

    def __str__(self):  # the reference's table printer (logtrics.go:210-218)
        inner = ", ".join(f" {_tostr(k)} = {_tostr(v)}, "
                          for k, v in self.d.items())
        return "[" + inner + "]"


def _normkey(k):
    # Lua: t[1] and t[1.0] are the same slot; we store int-valued floats
    # as ints so both spellings collide
    if isinstance(k, float) and k.is_integer():
        return int(k)
    return k


def _tostr(v) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if v.is_integer() and abs(v) < 1e16:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def _truthy(v) -> bool:
    return v is not None and v is not False


def _tonum(v, line: int):
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v.strip())
        except ValueError:
            pass
    raise LuaError(f"line {line}: arithmetic on a {type(v).__name__}")


class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class LuaFunction:
    __slots__ = ("params", "body", "env", "interp")

    def __init__(self, params, body, env, interp):
        self.params, self.body, self.env = params, body, env
        self.interp = interp

    def __call__(self, *args):
        scope = dict(zip(self.params, args))
        for p in self.params[len(args):]:
            scope[p] = None
        try:
            self.interp.exec_block(self.body, [scope] + self.env)
        except _Return as r:
            return r.value
        return None


class Interp:
    """Tree-walking evaluator.  ``globals`` is the chunk's global table;
    an environment is a list of scope dicts (innermost first) ending at
    the globals dict."""

    MAX_STEPS = 2_000_000      # runaway-loop guard per handler invocation

    def __init__(self, globals_: dict):
        self.globals = globals_
        self.steps = 0

    def _tick(self):
        self.steps += 1
        if self.steps > self.MAX_STEPS:
            raise LuaError("lua handler exceeded the step budget "
                           "(runaway loop?)")

    # -------------------------------------------------------- statements
    def exec_block(self, block: list, env: list):
        for st in block:
            self._tick()
            k = st[0]
            if k == "nop":
                continue
            if k == "local":
                _, names, exprs = st
                vals = [self.eval(e, env) for e in exprs]
                scope = env[0]
                for i, n in enumerate(names):
                    scope[n] = vals[i] if i < len(vals) else None
            elif k == "assign":
                _, targets, exprs = st
                vals = [self.eval(e, env) for e in exprs]
                for i, tg in enumerate(targets):
                    v = vals[i] if i < len(vals) else None
                    if tg[0] == "name":
                        self._setvar(tg[1], v, env)
                    else:
                        obj = self.eval(tg[1], env)
                        key = self.eval(tg[2], env)
                        if not isinstance(obj, LuaTable):
                            raise LuaError("index assignment on a "
                                           f"{type(obj).__name__}")
                        obj.set(key, v)
            elif k == "callstat":
                self.eval(st[1], env)
            elif k == "if":
                _, arms, els = st
                for cond, body in arms:
                    if _truthy(self.eval(cond, env)):
                        self.exec_block(body, [{}] + env)
                        break
                else:
                    self.exec_block(els, [{}] + env)
            elif k == "while":
                _, cond, body = st
                while _truthy(self.eval(cond, env)):
                    self._tick()
                    try:
                        self.exec_block(body, [{}] + env)
                    except _Break:
                        break
            elif k == "fornum":
                _, name, e0, e1, e2, body = st
                i = _tonum(self.eval(e0, env), 0)
                stop = _tonum(self.eval(e1, env), 0)
                step = _tonum(self.eval(e2, env), 0) if e2 else 1.0
                if step == 0:
                    raise LuaError("for loop with zero step")
                while (i <= stop) if step > 0 else (i >= stop):
                    self._tick()
                    try:
                        self.exec_block(body, [{name: i}] + env)
                    except _Break:
                        break
                    i += step
            elif k == "do":
                self.exec_block(st[1], [{}] + env)
            elif k == "break":
                raise _Break()
            elif k == "return":
                vals = [self.eval(e, env) for e in st[1]]
                raise _Return(vals[0] if vals else None)
            else:                                      # pragma: no cover
                raise LuaError(f"unknown statement {k}")

    def _setvar(self, name: str, v, env: list):
        for scope in env:
            if name in scope:
                scope[name] = v
                return
        self.globals[name] = v

    # -------------------------------------------------------- expressions
    def eval(self, e, env: list):
        self._tick()
        k = e[0]
        if k == "num":
            return e[1]
        if k == "str":
            return e[1]
        if k == "nil":
            return None
        if k == "true":
            return True
        if k == "false":
            return False
        if k == "name":
            for scope in env:
                if e[1] in scope:
                    return scope[e[1]]
            return self.globals.get(e[1])
        if k == "index":
            obj = self.eval(e[1], env)
            key = self.eval(e[2], env)
            if isinstance(obj, LuaTable):
                return obj.get(key)
            if isinstance(obj, dict):               # builtin module table
                return obj.get(key)
            if isinstance(key, str) and not key.startswith("_"):
                # binding proxies (graphite() handles): attribute access
                attr = getattr(obj, key, None)
                if callable(attr):
                    return attr
            raise LuaError(f"cannot index a {type(obj).__name__}")
        if k == "call":
            fn = self.eval(e[1], env)
            args = [self.eval(a, env) for a in e[2]]
            if not callable(fn):
                raise LuaError(f"attempt to call a {type(fn).__name__} "
                               f"({e[1]!r})")
            return fn(*args)
        if k == "method":
            obj = self.eval(e[1], env)
            args = [self.eval(a, env) for a in e[3]]
            if isinstance(obj, LuaTable):
                fn = obj.get(e[2])
                if not callable(fn):
                    raise LuaError(f"no method {e[2]!r}")
                return fn(obj, *args)
            fn = getattr(obj, e[2], None)
            if not callable(fn):
                raise LuaError(f"no method {e[2]!r} on "
                               f"{type(obj).__name__}")
            return fn(*args)
        if k == "func":
            return LuaFunction(e[1], e[2], env, self)
        if k == "table":
            t = LuaTable()
            pos = 0
            for kind, *rest in e[1]:
                if kind == "kv":
                    t.set(self.eval(rest[0], env), self.eval(rest[1], env))
                else:
                    pos += 1
                    t.set(float(pos), self.eval(rest[0], env))
            return t
        if k == "unop":
            v = self.eval(e[2], env)
            if e[1] == "not":
                return not _truthy(v)
            if e[1] == "-":
                return -_tonum(v, 0)
            if e[1] == "#":
                if isinstance(v, str):
                    return float(len(v))
                if isinstance(v, LuaTable):
                    return float(len(v))
                raise LuaError("length of a non-table/string")
        if k == "binop":
            op = e[1]
            if op == "and":
                l = self.eval(e[2], env)
                return self.eval(e[3], env) if _truthy(l) else l
            if op == "or":
                l = self.eval(e[2], env)
                return l if _truthy(l) else self.eval(e[3], env)
            l, r = self.eval(e[2], env), self.eval(e[3], env)
            if op == "..":
                for v in (l, r):
                    if not isinstance(v, (str, int, float)):
                        raise LuaError("concat of a "
                                       f"{type(v).__name__}")
                return _tostr(l) + _tostr(r)
            if op == "==":
                return self._eq(l, r)
            if op == "~=":
                return not self._eq(l, r)
            if op in ("<", ">", "<=", ">="):
                if isinstance(l, str) and isinstance(r, str):
                    pass
                else:
                    l, r = _tonum(l, 0), _tonum(r, 0)
                return {"<": l < r, ">": l > r,
                        "<=": l <= r, ">=": l >= r}[op]
            ln, rn = _tonum(l, 0), _tonum(r, 0)
            if op == "+":
                return ln + rn
            if op == "-":
                return ln - rn
            if op == "*":
                return ln * rn
            if op == "/":
                return ln / rn if rn != 0 else float("inf") * (1 if ln > 0 else -1 if ln < 0 else float("nan"))
            if op == "%":
                return ln - (ln // rn) * rn if rn != 0 else float("nan")
            if op == "^":
                return ln ** rn
        raise LuaError(f"unknown expression {k}")        # pragma: no cover

    @staticmethod
    def _eq(l, r) -> bool:
        if isinstance(l, bool) or isinstance(r, bool):
            return l is r
        if isinstance(l, (int, float)) and isinstance(r, (int, float)):
            return float(l) == float(r)
        return l is r if isinstance(l, LuaTable) else l == r


# ------------------------------------------------------- logtrics glue --

def _go_format(msg: str, args: list) -> str:
    """Render Go fmt verbs the way the reference's zerolog Msgf would:
    %v/%s stringify (tables via the reference's printer), %d as int,
    %f/%g as floats.  Unknown verbs pass through with the arg appended."""
    out = []
    i = a = 0
    while i < len(msg):
        c = msg[i]
        if c == "%" and i + 1 < len(msg):
            v = msg[i + 1]
            if v == "%":
                out.append("%")
                i += 2
                continue
            arg = args[a] if a < len(args) else "<missing>"
            a += 1
            if v in ("v", "s"):
                out.append(_tostr(arg))
            elif v == "d":
                out.append(str(int(arg)) if isinstance(arg, (int, float))
                           else _tostr(arg))
            elif v in ("f", "g", "e"):
                out.append(("%" + v) % float(arg))
            else:
                out.append("%" + v + "(" + _tostr(arg) + ")")
            i += 2
        else:
            out.append(c)
            i += 1
    if a < len(args):
        out.extend(" " + _tostr(x) for x in args[a:])
    return "".join(out)


class _MetricProxy:
    """One graphite().counter/timer/gauge/meter(name) handle; the verb
    call records the emission (graphite/graphite.go:155-219)."""

    __slots__ = ("sink", "mtype", "name")

    def __init__(self, sink, mtype, name):
        if not name or not isinstance(name, str):
            raise LuaError(f"graphite: invalid {mtype} name")
        self.sink, self.mtype, self.name = sink, mtype, name

    def inc(self, v=1.0):
        self.sink.append((self.mtype, self.name, float(v)))

    def dec(self, v=1.0):
        self.sink.append((self.mtype, self.name, -float(v)))

    def update(self, v):
        self.sink.append((self.mtype, self.name, float(v)))

    def mark(self, v=1.0):
        self.sink.append((self.mtype, self.name, float(v)))


class _GraphiteAPI:
    __slots__ = ("sink",)

    def __init__(self, sink):
        self.sink = sink

    def counter(self, name):
        return _MetricProxy(self.sink, "counter", name)

    def gauge(self, name):
        return _MetricProxy(self.sink, "gauge", name)

    def timer(self, name):
        return _MetricProxy(self.sink, "timer", name)

    def meter(self, name):
        return _MetricProxy(self.sink, "meter", name)


def _stdlib(rand) -> dict:
    import math as _m

    def _sub(s, i, j=None):
        i = int(i)
        n = len(s)
        j = n if j is None else int(j)
        if i < 0:
            i = max(n + i + 1, 1)
        elif i == 0:
            i = 1
        if j < 0:
            j = n + j + 1
        return s[i - 1:min(j, n)]

    def _format(fmt, *args):
        return _go_format(fmt, list(args)) if "%v" in fmt else _py_fmt(fmt, args)

    def _py_fmt(fmt, args):
        coerced = []
        ai = 0
        for m in re.finditer(r"%[-+ #0]*\d*(?:\.\d+)?([diouxXeEfgGqscm%])",
                             fmt):
            v = m.group(1)
            if v == "%":
                continue
            a = args[ai] if ai < len(args) else ""
            ai += 1
            if v in "diouxX":
                coerced.append(int(a))
            elif v in "eEfgG":
                coerced.append(float(a))
            else:
                coerced.append(_tostr(a))
        try:
            return fmt.replace("%q", "%r") % tuple(coerced)
        except (TypeError, ValueError) as ex:
            raise LuaError(f"string.format: {ex}") from ex

    def _random(m=None, n=None):
        r = rand()
        if m is None:
            return r
        m = int(m)
        if n is None:
            return float(1 + int(r * m))
        return float(int(m) + int(r * (int(n) - m + 1)))

    return {
        "tostring": _tostr,
        "tonumber": lambda v, base=None: (
            float(int(v, int(base))) if base is not None and isinstance(v, str)
            else (float(v) if isinstance(v, (int, float)) else
                  (lambda s: float(s) if re.fullmatch(
                      r"\s*-?(?:0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+)\s*", s)
                   else None)(v) if isinstance(v, str) else None)),
        "type": lambda v: ("nil" if v is None else
                           "boolean" if isinstance(v, bool) else
                           "number" if isinstance(v, (int, float)) else
                           "string" if isinstance(v, str) else
                           "table" if isinstance(v, LuaTable) else
                           "function"),
        "string": {
            "format": _format,
            "upper": lambda s: s.upper(),
            "lower": lambda s: s.lower(),
            "len": lambda s: float(len(s)),
            "sub": _sub,
            "rep": lambda s, n: s * int(n),
            "find": lambda s, pat, init=1.0: (
                (lambda m: (float(m.start() + 1), float(m.end()))
                 if m else None)(re.compile(re.escape(pat)).search(
                     s, int(init) - 1))),
        },
        "math": {
            "floor": lambda x: float(_m.floor(x)),
            "ceil": lambda x: float(_m.ceil(x)),
            "abs": lambda x: float(abs(x)),
            "max": lambda *xs: float(max(xs)),
            "min": lambda *xs: float(min(xs)),
            "sqrt": lambda x: float(_m.sqrt(x)),
            "huge": _m.inf,
            "random": _random,
        },
    }


class LuaHandler:
    """RuleSpec.handler adapter: executes the rule's Lua handler function
    per matched event, returning the recorded graphite emissions as the
    engine's [(metric_type, series, value), ...] contract.

    ``math.random`` draws from a deterministic per-(rule, line) stream:
    rerunning any partition layout reproduces the same points, which the
    reference's wall-clock-seeded RNG cannot promise."""

    def __init__(self, name: str, fn: LuaFunction, interp: Interp):
        self.rule_name = name
        self.fn = fn
        self.interp = interp
        self.graphite_conf: dict | None = None
        # Per-call state reached through stable closures: the stdlib and
        # binding dicts are built ONCE per handler here, not per event —
        # the hot path only swaps what they point at (the reference
        # re-binds per state too, logtrics.go:162-173, but per-event
        # rebuilding is pure overhead at batch scale).  Bindings live on
        # the handler, NOT in the shared interp.globals: several rules
        # in one script share an interp, so installing closures at
        # construction time would leave the last-built handler's
        # closures active for every rule.  __call__ installs them only
        # when the active handler changes.
        self._sink: list[tuple] = []
        self._line = ""
        self._log = None
        self._bindings = _stdlib(self._rand)
        self._bindings["graphite"] = lambda: _GraphiteAPI(self._sink)
        for lvl in ("trace", "debug", "info", "warn", "error", "fatal"):
            self._bindings[lvl] = (lambda L: lambda msg, *a: getattr(
                self._log, L)("%s", _go_format(str(msg), list(a))))(lvl)

    def _rand(self):
        import hashlib
        h = hashlib.sha256(
            f"{self.rule_name}\x00{self._line}\x00{len(self._sink)}".encode()
        ).digest()
        return int.from_bytes(h[:7], "big") / float(1 << 56)

    def __getstate__(self):
        # the closures over self survive cloudpickle; sink/log are
        # per-call and reset on arrival
        d = self.__dict__.copy()
        d["_sink"], d["_line"], d["_log"] = [], "", None
        return d

    def __call__(self, event: dict, log) -> list[tuple]:
        sink: list[tuple] = []
        self._sink = sink
        self._line = str(event.get("_line", ""))
        self._log = log
        if getattr(self.interp, "bound_handler", None) is not self:
            self.interp.globals.update(self._bindings)
            self.interp.bound_handler = self
        tbl = LuaTable(dict(event))
        self.interp.steps = 0
        self.fn(tbl)
        return sink


def load_lua_rules(path_or_source: str):
    """Evaluate a reference-style Lua script and return the engine rules
    it registers — ``load_rules`` for ``*.lua``.  Accepts a file path or
    the source text itself."""
    import os

    from logtrics_ray.rules import RuleSpec, load_rules

    src = path_or_source
    if len(path_or_source) < 4096 and os.path.exists(path_or_source):
        with open(path_or_source) as f:
            src = f.read()

    chunk = Parser(tokenize(src)).parse_chunk()
    globals_: dict = {}
    interp = Interp(globals_)
    registered: list[dict] = []

    def _logtrics(tbl):
        if not isinstance(tbl, LuaTable):
            raise LuaError("logtrics{} expects a table")
        from logtrics_ray.rules import _FORBIDDEN_RULE_KEYS
        forbidden = set(tbl.d) & _FORBIDDEN_RULE_KEYS
        if forbidden:
            # the reference's exact message for these keys
            # (/root/reference/logtrics.go:98-99)
            raise LuaError("modification is not supported for "
                           f"[{sorted(forbidden)[0]}]")
        known = {"name", "parser", "handler", "graphite", "logging",
                 "scheduler", "expression"}
        unknown = set(tbl.d) - known
        if unknown:
            raise LuaError(f"logtrics{{}}: unknown keys {sorted(unknown)} "
                           "(strict like logtrics.go:100-101)")
        parser = tbl.get("parser")
        if not isinstance(parser, LuaTable):
            raise LuaError("logtrics{}: parser table is required "
                           "(logtrics.go:37-45)")
        ptype = parser.get("type") or "re2"
        if ptype != "re2":
            raise LuaError(f"parser.type {ptype!r} not supported (re2 only, "
                           "parser.go:23-31)")
        expression = parser.get("expression")
        if not expression:
            raise LuaError("parser.expression is required")
        handler = tbl.get("handler")
        if not isinstance(handler, LuaFunction):
            raise LuaError("logtrics{}: handler function is required "
                           "(logtrics.go:47-51)")
        name = tbl.get("name") or f"lua-rule-{len(registered)}"
        h = LuaHandler(name, handler, interp)
        spec = {"name": name, "expression": str(expression), "handler": h}
        gconf = tbl.get("graphite")
        if gconf is not None:
            if not isinstance(gconf, LuaTable):
                raise LuaError("invalid graphite configuration "
                               "(logtrics.go:109-110)")
            h.graphite_conf = {str(k): v for k, v in gconf.d.items()}
            # flows into RuleSpec.graphite via load_rules (validated and
            # coerced there; interval -> per-rule window width)
            spec["graphite"] = h.graphite_conf
        lconf = tbl.get("logging")
        if lconf is not None:
            if not isinstance(lconf, LuaTable):
                raise LuaError("invalid logging configuration "
                               "(logtrics.go:140-142)")
            spec["logging"] = {str(k): v for k, v in lconf.d.items()}
        registered.append(spec)

    # stdlib available at chunk top level too (handlers get fresh
    # per-call bindings later)
    globals_.update(_stdlib(lambda: 0.5))
    globals_["logtrics"] = _logtrics
    try:
        interp.exec_block(chunk, [{}])
    except (_Break, _Return):
        pass
    if not registered:
        raise LuaError("script registered no logtrics{} rules")
    rules = load_rules(registered)
    # keep RuleSpec identity: handler objects already attached
    assert all(isinstance(r, RuleSpec) for r in rules)
    return rules
