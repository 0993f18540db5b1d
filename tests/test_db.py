"""DB plane tests without a database: upsert SQL generation and flow.

SQLAlchemy is not installed in this image, so a minimal stub is injected
and connections record the SQL they execute. This pins the reference
semantics (``db_tools.py:44-139``): create-table-plus-constraint on first
write, temp-table staging + ``INSERT ... ON CONFLICT DO UPDATE`` afterwards,
and time-sorted query results.
"""

import sys
import types

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def sqlalchemy_stub(monkeypatch):
    mod = types.ModuleType("sqlalchemy")
    mod.text = lambda s: s
    monkeypatch.setitem(sys.modules, "sqlalchemy", mod)
    return mod


class FakeResult:
    def __init__(self, value):
        self.value = value

    def scalar_one(self):
        return self.value


class FakeConn:
    def __init__(self, table_exists):
        self.table_exists = table_exists
        self.executed = []

    def execute(self, stmt, params=None):
        self.executed.append((str(stmt), params))
        if "information_schema.tables" in str(stmt):
            return FakeResult(self.table_exists)
        return FakeResult(None)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class FakeEngine:
    def __init__(self, table_exists):
        self.conn = FakeConn(table_exists)

    def begin(self):
        return self.conn

    def connect(self):
        return self.conn


@pytest.fixture()
def to_sql_recorder(monkeypatch):
    calls = []

    def fake_to_sql(self, name, conn, **kw):
        calls.append({"name": name, "kw": kw, "n": len(self)})

    monkeypatch.setattr(pd.DataFrame, "to_sql", fake_to_sql)
    return calls


def _df():
    return pd.DataFrame(
        {"key": ["a", "b"], "time": [1, 2], "v": [0.5, 1.5]}
    ).set_index(["key", "time"])


def test_upsert_creates_table_and_constraint(sqlalchemy_stub, to_sql_recorder):
    from audio_processing_tools_tpu.io.db import upsert_df

    eng = FakeEngine(table_exists=False)
    assert upsert_df(_df(), "dsd_from_raw_audio", eng)
    # one direct to_sql into the real table
    assert to_sql_recorder[0]["name"] == "dsd_from_raw_audio"
    ddl = " ".join(s for s, _ in eng.conn.executed)
    assert 'ADD CONSTRAINT uq_upsert_dsd_from_raw_audio_key_time UNIQUE ("key", "time")' in ddl
    assert "ON CONFLICT" not in ddl  # no staging on first write


def test_upsert_stages_and_conflicts(sqlalchemy_stub, to_sql_recorder):
    from audio_processing_tools_tpu.io.db import upsert_df

    eng = FakeEngine(table_exists=True)
    assert upsert_df(_df(), "dsd_from_raw_audio", eng)
    # staged via a temp table, then conflict-upserted, then dropped
    assert to_sql_recorder[0]["name"].startswith("tmp_dsd_from_raw_audio_")
    stmts = [s for s, _ in eng.conn.executed]
    conflict = [s for s in stmts if "ON CONFLICT" in s]
    assert len(conflict) == 1
    sql = conflict[0]
    assert 'INSERT INTO "public"."dsd_from_raw_audio"' in sql
    assert 'ON CONFLICT ("key", "time") DO UPDATE SET "v" = EXCLUDED."v"' in sql
    assert any(s.startswith('DROP TABLE "public"."tmp_') for s in stmts)


def test_upsert_plan_defaults_unnamed_index():
    from audio_processing_tools_tpu.io.db import _UpsertPlan

    df = pd.DataFrame({"v": [1, 2]})
    plan = _UpsertPlan(df, "t", "public")
    assert plan.key_cols == ["idx"]
    assert 'ON CONFLICT ("idx")' in plan.conflict_sql("stage")


def test_get_db_data_sorts_by_time(sqlalchemy_stub, monkeypatch):
    from audio_processing_tools_tpu.io import db as db_mod

    out = pd.DataFrame({"time": [3, 1, 2], "v": [30, 10, 20]})
    monkeypatch.setattr(pd, "read_sql_query", lambda q, conn, params=None: out)
    df = db_mod.get_db_data("SELECT 1", FakeEngine(True))
    assert list(df["time"]) == [1, 2, 3]
    assert list(df["v"]) == [10, 20, 30]


def test_get_db_data_wraps_connection_errors(sqlalchemy_stub, monkeypatch):
    from audio_processing_tools_tpu.io import db as db_mod

    def boom(*a, **k):
        raise OSError("no route to host")

    monkeypatch.setattr(pd, "read_sql_query", boom)
    with pytest.raises(RuntimeError, match="VPN"):
        db_mod.get_db_data("SELECT 1", FakeEngine(True))
