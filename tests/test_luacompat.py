"""Lua script compatibility: the reference's rule language
(/root/reference/script.go:23-36, logtrics.go:31-69) loads unchanged.

Covers the interpreter subset, the logtrics{}/graphite()/logging
bindings, deterministic math.random, strict load-time failures, the
reference's own shipped example script, and a full run through the
distributed extraction path."""

import os

import pytest

from logtrics_ray.luacompat import (Interp, LuaError, Parser,
                                    load_lua_rules, tokenize)


def _run(src: str) -> dict:
    g: dict = {}
    from logtrics_ray.luacompat import _stdlib
    g.update(_stdlib(lambda: 0.25))
    Interp(g).exec_block(Parser(tokenize(src)).parse_chunk(), [{}])
    return g


def test_interp_core_semantics():
    g = _run(r"""
        -- comment --[[ not a block opener here ]] is line comment
        x = 1 + 2 * 3 - 4 / 2          -- precedence: 5
        y = 2 ^ 3 ^ 2                  -- right assoc: 512
        neg = -2 ^ 2                   -- -(2^2) = -4
        s = "a" .. 1 .. "." .. 2.5     -- int-valued floats print bare
        t = { name = "n", [2] = "two", "one", nested = { k = 7 } }
        n1 = t[1]
        n2 = t[2.0]                    -- 2 and 2.0 are the same slot
        nested_k = t.nested.k
        eq = (1 == 1.0)
        ne = ("a" ~= "b")
        longstr = [[raw \n not escaped]]
        cnt = 0
        for i = 1, 5, 2 do cnt = cnt + i end   -- 1+3+5
        w = 0
        while w < 10 do w = w + 3 if w > 5 then break end end
        local function add(a, b) return a + b end
        sum = add(2, 3)
        cond = nil
        if false then cond = "no" elseif 0 then cond = "zero-is-true"
        else cond = "else" end
        sf = string.format("%s=%d/%.2f", "v", 7, 1.5)
        up = string.upper("abc")
        sub = string.sub("hello", 2, 4)
        tn = tonumber("42") + tonumber("1.5")
        tnn = tonumber("nope")
        fl = math.floor(3.9)
        ty = type({})
    """)
    assert g["x"] == 5.0 and g["y"] == 512.0 and g["neg"] == -4.0
    assert g["s"] == "a1.2.5"
    assert g["n1"] == "one" and g["n2"] == "two" and g["nested_k"] == 7.0
    assert g["eq"] is True and g["ne"] is True
    assert g["longstr"] == r"raw \n not escaped"
    assert g["cnt"] == 9.0 and g["w"] == 6.0
    assert g["sum"] == 5.0 and g["cond"] == "zero-is-true"
    assert g["sf"] == "v=7/1.50"
    assert g["up"] == "ABC" and g["sub"] == "ell"
    assert g["tn"] == 43.5 and g["tnn"] is None
    assert g["fl"] == 3.0 and g["ty"] == "table"


def test_interp_closures_and_scoping():
    g = _run("""
        local base = 10
        function mk(n) return function(x) return base + n + x end end
        f = mk(5)
        r = f(1)
        local shadow = 1
        do local shadow = 2 inner = shadow end
        outer = shadow
    """)
    assert g["r"] == 16.0
    assert g["inner"] == 2.0 and g["outer"] == 1.0


def test_unsupported_constructs_fail_at_load_with_line():
    for src, frag in [
        ("for k, v in pairs(t) do end", "generic for"),
        ("local a = ...", "vararg"),
        ("x = 1 ]", "unexpected" ),
    ]:
        with pytest.raises(LuaError) as ei:
            _run(src)
        assert "line 1" in str(ei.value) or frag in str(ei.value)
    with pytest.raises(LuaError) as ei:
        _run("x = 1\nfor k, v in pairs(t) do end")
    assert "line 2" in str(ei.value)


def test_runaway_loop_guard():
    with pytest.raises(LuaError, match="step budget"):
        _run("while true do end")


LUA_SCRIPT = """
local prefix = "lt.lua"

logtrics {
    name = "lua-latency",
    parser = {
        type = "re2",
        expression = 'latency_ms=(?P<ms>[0-9]+) (?P<ep>[a-z]+)',
    },
    handler = function(event)
        local v = tonumber(event.ms)
        info("lat %v from %v", v, event._source)
        graphite().timer(prefix .. ".timer." .. event.ep).update(v)
        if v > 20 then
            graphite().counter(prefix .. ".slow").inc(1)
        end
    end,
}

logtrics {
    name = "lua-hello",
    parser = { type = "re2", expression = 'hello "(?P<w>[a-zA-Z]+)"' },
    handler = function(event)
        graphite().gauge(prefix .. ".hello." .. string.lower(event.w))
            .update(string.len(event.w))
        graphite().meter(prefix .. ".seen").mark(1)
        graphite().counter(prefix .. ".downs").dec(2)
    end,
}
"""


def test_load_lua_rules_and_handler_emissions():
    rules = load_lua_rules(LUA_SCRIPT)
    assert [r.name for r in rules] == ["lua-latency", "lua-hello"]
    assert rules[0].expression == r"latency_ms=(?P<ms>[0-9]+) (?P<ep>[a-z]+)"
    assert rules[0].group_names == ["ms", "ep"]

    class Log:
        def __init__(self):
            self.msgs = []

        def __getattr__(self, lvl):
            return lambda fmt, *a: self.msgs.append((lvl, fmt % a))

    log = Log()
    out = rules[0].handler(
        {"ms": "41", "ep": "users", "_source": "s1", "_line": "x"}, log)
    assert out == [("timer", "lt.lua.timer.users", 41.0),
                   ("counter", "lt.lua.slow", 1.0)]
    assert log.msgs == [("info", "lat 41 from s1")]
    # below the threshold: no counter line
    out = rules[0].handler(
        {"ms": "9", "ep": "users", "_source": "s1", "_line": "y"}, log)
    assert out == [("timer", "lt.lua.timer.users", 9.0)]

    out = rules[1].handler({"w": "World", "_line": "z"}, log)
    assert out == [("gauge", "lt.lua.hello.world", 5.0),
                   ("meter", "lt.lua.seen", 1.0),
                   ("counter", "lt.lua.downs", -2.0)]


def test_math_random_is_per_event_deterministic():
    rules = load_lua_rules("""
        logtrics {
            name = "r",
            parser = { type = "re2", expression = "(?P<x>x)" },
            handler = function(event)
                graphite().gauge("g").update(math.random(1, 10))
            end,
        }
    """)

    class Log:
        def __getattr__(self, _):
            return lambda *a: None

    a = rules[0].handler({"x": "x", "_line": "same"}, Log())
    b = rules[0].handler({"x": "x", "_line": "same"}, Log())
    c = rules[0].handler({"x": "x", "_line": "other"}, Log())
    assert a == b
    assert 1.0 <= a[0][2] <= 10.0 and 1.0 <= c[0][2] <= 10.0


def test_interleaved_handlers_keep_their_own_bindings():
    """Handlers from one script share an interp; the once-per-handler
    binding install must swap on every handler switch, or rule A would
    run with rule B's math.random stream / log sink / graphite sink."""
    rules = load_lua_rules("""
        logtrics {
            name = "a",
            parser = { type = "re2", expression = "(?P<x>x)" },
            handler = function(e)
                info("from-a")
                graphite().gauge("a").update(math.random())
            end,
        }
        logtrics {
            name = "b",
            parser = { type = "re2", expression = "(?P<x>x)" },
            handler = function(e)
                info("from-b")
                graphite().gauge("b").update(math.random())
            end,
        }
    """)

    class Log:
        def __init__(self):
            self.msgs = []

        def __getattr__(self, lvl):
            return lambda fmt, *a: self.msgs.append(fmt % a)

    ev = {"x": "x", "_line": "same"}
    # solo baselines (fresh logs so attribution is unambiguous)
    a_solo = rules[0].handler(dict(ev), Log())
    b_solo = rules[1].handler(dict(ev), Log())
    # interleave: a, b, a — each must reproduce its solo emission and
    # write only to the log handed to THAT call
    la, lb, la2 = Log(), Log(), Log()
    assert rules[0].handler(dict(ev), la) == a_solo
    assert rules[1].handler(dict(ev), lb) == b_solo
    assert rules[0].handler(dict(ev), la2) == a_solo
    assert la.msgs == ["from-a"] and la2.msgs == ["from-a"]
    assert lb.msgs == ["from-b"]
    # the two rules' deterministic random streams are keyed by rule name
    assert a_solo[0][2] != b_solo[0][2]


def test_strict_load_failures():
    with pytest.raises(LuaError, match="unknown keys"):
        load_lua_rules("""logtrics { name = "n", bogus = 1,
            parser = { expression = "x" },
            handler = function(e) end }""")
    with pytest.raises(LuaError, match="handler"):
        load_lua_rules(
            'logtrics { name = "n", parser = { expression = "x" } }')
    with pytest.raises(LuaError, match="re2 only"):
        load_lua_rules("""logtrics { name = "n",
            parser = { type = "glob", expression = "x" },
            handler = function(e) end }""")
    with pytest.raises(LuaError, match="no logtrics"):
        load_lua_rules("local x = 1")


def test_reference_example_script_loads_and_runs():
    """The reference repo's shipped example script evaluates unchanged
    (all graphite calls in it are commented out, so a match logs but
    emits nothing)."""
    path = "/root/reference/examples/scripts/logtrics.lua"
    if not os.path.exists(path):
        pytest.skip("reference example not present")
    rules = load_lua_rules(path)
    assert [r.name for r in rules] == ["logtrics-example"]
    assert "hello" in rules[0].expression

    msgs = []

    class Log:
        def __getattr__(self, lvl):
            return lambda fmt, *a: msgs.append(fmt % a)

    out = rules[0].handler(
        {"first": "World", "_source": "s", "_line": 'hello "World"'}, Log())
    assert out == []                       # every graphite call commented
    assert any("fields are" in m for m in msgs)


def test_load_rules_discovers_lua_files(tmp_path):
    """`load_rules` accepts a *.lua path directly and walks mixed
    *.toml/*.lua dirs in sorted order (≙ the reference's scriptdir
    discovery, app.go:96-111); duplicate names across files are fatal."""
    from logtrics_ray.rules import load_rules

    (tmp_path / "b.lua").write_text(LUA_SCRIPT)
    (tmp_path / "a.toml").write_text(
        '[[rule]]\nname = "toml-rule"\n'
        'expression = "GET /api/(?P<ep>[a-z]+)"\n'
        '[[rule.emit]]\nmetric_type = "counter"\n'
        'series = "lt.req.{ep}"\nvalue = 1\n')

    direct = load_rules(str(tmp_path / "b.lua"))
    assert [r.name for r in direct] == ["lua-latency", "lua-hello"]

    mixed = load_rules(str(tmp_path))
    assert [r.name for r in mixed] == ["toml-rule", "lua-latency",
                                       "lua-hello"]

    (tmp_path / "c.lua").write_text(LUA_SCRIPT)
    with pytest.raises(ValueError, match="duplicate rule name"):
        load_rules(str(tmp_path))


def test_lua_rules_through_distributed_extraction(ray_session, tmp_path):
    """Full path: log lines -> read_log_lines -> extract_points with
    Lua-defined rules (handlers cross the cloudpickle boundary into Ray
    workers) -> points table."""
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.sources.text import read_log_lines
    from logtrics_ray.stages.extract import extract_points

    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text(
        "latency_ms=41 users\nlatency_ms=9 users\n"
        'hello "World"\nnothing here\n')
    rules = load_lua_rules(LUA_SCRIPT)
    pts = extract_points(read_log_lines(str(d)), rules, EngineConfig(),
                         text_column="text").to_pandas()
    em = sorted(zip(pts.metric_type, pts.series_key, pts.value))
    assert em == [
        ("counter", "lt.lua.downs", -2.0),
        ("counter", "lt.lua.slow", 1.0),
        ("gauge", "lt.lua.hello.world", 5.0),
        ("meter", "lt.lua.seen", 1.0),
        ("timer", "lt.lua.timer.users", 9.0),
        ("timer", "lt.lua.timer.users", 41.0),
    ]
