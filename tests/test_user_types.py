"""CREATE DOMAIN / composite CREATE TYPE / CREATE TYPE AS ENUM
(commands/typecmds.c, utils/adt/enum.c; regress sql/domain.sql,
sql/composite_types.sql, sql/enum.sql)."""

import pytest

from warehouse_pg_spark.engine import Engine


@pytest.fixture()
def eng(spark, sf_dir, tmp_path_factory):
    e = Engine(spark=spark, warehouse_dir=str(tmp_path_factory.mktemp("ut")))
    e.attach_fixtures(sf_dir)
    return e


def test_domain_check_pass_and_fail(eng):
    eng.sql("CREATE DOMAIN posint AS integer CHECK (VALUE > 0)")
    assert eng.sql("SELECT 5::posint AS a").collect()[0].a == 5
    # NULL passes a CHECK (table-constraint truth table) when no
    # NOT NULL is declared (domain.sql)
    assert eng.sql("SELECT NULL::posint AS a").collect()[0].a is None
    with pytest.raises(Exception, match="violates check constraint"):
        eng.sql("SELECT (-5)::posint AS a").collect()
    # CAST(x AS domain) spelling takes the same path
    assert eng.sql("SELECT CAST(7 AS posint) AS a").collect()[0].a == 7
    eng.sql("DROP DOMAIN posint")


def test_domain_not_null_and_named_constraint(eng):
    eng.sql(
        "CREATE DOMAIN dcheck AS varchar(15) NOT NULL "
        "CONSTRAINT dcheck_ck CHECK (VALUE = 'hello')"
    )
    assert eng.sql("SELECT 'hello'::dcheck AS a").collect()[0].a == "hello"
    with pytest.raises(Exception, match="dcheck"):
        eng.sql("SELECT NULL::dcheck AS a").collect()
    with pytest.raises(Exception, match="dcheck_ck"):
        eng.sql("SELECT 'bye'::dcheck AS a").collect()
    eng.sql("DROP DOMAIN dcheck")


def test_alter_domain(eng):
    eng.sql("CREATE DOMAIN scale_d AS numeric(10,2)")
    # numeric(10,2) rounds half away from zero: 5.005 -> 5.01
    assert float(eng.sql("SELECT 5.005::scale_d AS a").collect()[0].a) == 5.01
    eng.sql("ALTER DOMAIN scale_d ADD CONSTRAINT pos CHECK (VALUE >= 0)")
    with pytest.raises(Exception, match='"pos"'):
        eng.sql("SELECT (-1)::scale_d AS a").collect()
    eng.sql("ALTER DOMAIN scale_d DROP CONSTRAINT pos")
    r = eng.sql("SELECT (-1)::scale_d AS a").collect()[0].a
    assert float(r) == -1.0
    eng.sql("DROP DOMAIN scale_d")


def test_domain_over_dialect_type(eng):
    # a domain over a PG-only type inherits the downstream rewrite
    eng.sql("CREATE DOMAIN netaddr AS inet")
    assert (
        eng.sql("SELECT '10.0.0.1/24'::netaddr AS a").collect()[0].a
        == "10.0.0.1/24"
    )
    eng.sql("DROP DOMAIN netaddr")


def test_domain_in_create_table_column(eng):
    eng.sql("CREATE DOMAIN qty_d AS integer CHECK (VALUE >= 0)")
    eng.sql("CREATE TEMP TABLE dom_tab AS SELECT 3::qty_d AS q")
    assert eng.sql("SELECT q FROM dom_tab").collect()[0].q == 3
    eng.sql("DROP DOMAIN qty_d")


def test_composite_type(eng):
    eng.sql("CREATE TYPE cpx AS (r float8, i float8)")
    r = eng.sql(
        "SELECT (1.5, -2.5)::cpx AS v,"
        "       (ROW(1.5, -2.5)::cpx).i AS i,"
        "       ('(3,4)'::cpx).r AS litr,"
        "       (NULL::cpx).i AS nulli"
    ).collect()[0]
    assert r.v.r == 1.5 and r.v.i == -2.5
    assert r.i == -2.5 and r.litr == 3.0 and r.nulli is None
    # arity mismatch errors like PG's "cannot cast"
    with pytest.raises(Exception, match="cannot cast"):
        eng.sql("SELECT (1, 2, 3)::cpx AS v")
    eng.sql("DROP TYPE cpx")


def test_enum_type(eng):
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    r = eng.sql(
        "SELECT 'ok'::mood AS m, enum_first(NULL::mood) AS f,"
        "       enum_last(NULL::mood) AS l,"
        "       array_position(enum_range(NULL::mood), 'ok') AS ord"
    ).collect()[0]
    assert (r.m, r.f, r.l, r.ord) == ("ok", "sad", "happy", 2)
    with pytest.raises(Exception, match="invalid input value for enum"):
        eng.sql("SELECT 'angry'::mood AS m")
    eng.sql("DROP TYPE mood")


def test_enum_declaration_order(eng):
    """enum.c enum_cmp: comparisons follow enumsortorder (declaration
    position), not lexicographic text — 'sad' < 'ok' < 'happy' even
    though text order is the reverse."""
    eng.sql("CREATE TYPE mood2 AS ENUM ('sad', 'ok', 'happy')")
    r = eng.sql(
        "SELECT 'sad'::mood2 < 'happy'::mood2 AS lt,"
        "       'ok'::mood2 >= 'happy'::mood2 AS ge,"
        "       least('happy'::mood2, 'ok'::mood2,"
        "             'sad'::mood2) AS lo,"
        "       greatest('sad'::mood2, 'ok'::mood2) AS hi"
    ).collect()[0]
    assert (r.lt, r.ge, r.lo, r.hi) == (True, False, "sad", "ok")
    # min/max aggregate over enum casts maps through ordinals
    r = eng.sql(
        "SELECT min(m::mood2) AS lo, max(m::mood2) AS hi FROM "
        "(VALUES ('ok'), ('happy'), ('sad')) AS t(m)"
    ).collect()[0]
    assert (r.lo, r.hi) == ("sad", "happy")
    # ORDER BY an enum cast sorts by declaration order
    rows = eng.sql(
        "SELECT m FROM (VALUES ('ok'), ('happy'), ('sad')) AS t(m) "
        "ORDER BY m::mood2"
    ).collect()
    assert [x.m for x in rows] == ["sad", "ok", "happy"]
    # non-literal cast carries a runtime label guard
    with pytest.raises(Exception, match="invalid input value for enum"):
        eng.sql(
            "SELECT upper(m)::mood2 AS m FROM "
            "(VALUES ('nope')) AS t(m)"
        ).collect()
    eng.sql("DROP TYPE mood2")


def test_domain_check_value_inside_literal(eng):
    """The word 'value' INSIDE a string literal of the CHECK body is
    never substituted (typecmds.c: VALUE is a keyword reference, a
    literal is opaque)."""
    eng.sql(
        "CREATE DOMAIN wordy AS text "
        "CHECK (VALUE IN ('value', 'other'))"
    )
    assert eng.sql("SELECT 'value'::wordy AS a").collect()[0].a == "value"
    assert eng.sql("SELECT 'other'::wordy AS a").collect()[0].a == "other"
    with pytest.raises(Exception, match="violates check constraint"):
        eng.sql("SELECT 'bad'::wordy AS a").collect()
    eng.sql("DROP DOMAIN wordy")


def test_drop_semantics(eng):
    with pytest.raises(Exception, match="does not exist"):
        eng.sql("DROP DOMAIN no_such_dom")
    # IF EXISTS is silent
    eng.sql("DROP DOMAIN IF EXISTS no_such_dom")
    eng.sql("DROP TYPE IF EXISTS no_such_type CASCADE")


def test_json_populate_record_over_composite(eng):
    """json[b]_populate_record(set) over a session composite
    (jsonfuncs.c populate_record): the composite's fields are a
    from_json schema — missing keys NULL, extra keys ignored."""
    eng.sql("CREATE TYPE jp_pair AS (x int, y int)")
    r = eng.sql(
        "SELECT json_populate_record(null::jp_pair,"
        " '{\"x\": 0, \"y\": 1}') AS r"
    ).collect()[0].r
    assert (r.x, r.y) == (0, 1)
    rows = eng.sql(
        "SELECT jsonb_populate_recordset(null::jp_pair,"
        " '[{\"x\": 0, \"y\": 1}, {\"y\": 3}]') AS r"
    ).collect()
    assert len(rows) == 2
    assert rows[1].r.x is None and rows[1].r.y == 3
    eng.sql("DROP TYPE jp_pair")


def test_json_populate_record_base_merge(eng):
    """populate_record with a non-NULL base (jsonfuncs.c): a key
    present in the json overrides (explicit null sets NULL); a missing
    key keeps the base field."""
    eng.sql("CREATE TYPE jp_pair2 AS (x int, y int)")
    r = eng.sql(
        "SELECT json_populate_record(row(1,2)::jp_pair2,"
        " '{\"x\": 0}') AS r"
    ).collect()[0].r
    assert (r.x, r.y) == (0, 2)
    r = eng.sql(
        "SELECT json_populate_record(row(1,2)::jp_pair2,"
        " '{\"x\": null}') AS r"
    ).collect()[0].r
    assert (r.x, r.y) == (None, 2)
    eng.sql("DROP TYPE jp_pair2")
