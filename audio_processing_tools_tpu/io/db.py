"""Postgres plane (gated on SQLAlchemy; parity with reference ``db_tools.py``).

``get_db_data`` runs SQL into a DataFrame (sorted by ``time`` when present);
``upsert_df`` does a transactional create-if-missing + temp-table +
``ON CONFLICT DO UPDATE`` upsert keyed on the DataFrame index.
"""

from __future__ import annotations

import uuid
from typing import Dict, Optional


def _require_sqlalchemy():
    try:
        import sqlalchemy  # noqa: F401

        return sqlalchemy
    except ImportError as e:
        raise ImportError(
            "SQLAlchemy is required for database operations but is not "
            "installed."
        ) from e


def get_db_data(query: str, db_engine, *, params: Optional[dict] = None):
    """SQL -> DataFrame, sorted by 'time' column when present."""
    _require_sqlalchemy()
    import pandas as pd
    from sqlalchemy import text

    try:
        with db_engine.connect() as conn:
            df = pd.read_sql_query(text(query), conn, params=params)
    except Exception as e:
        raise RuntimeError(
            "Database query failed. Check connection or VPN status."
        ) from e
    if "time" in df.columns:
        df = df.sort_values("time").reset_index(drop=True)
    return df


def upsert_df(df, table_name: str, engine, *, schema: str = "public",
              chunksize: int = 1000,
              dtype: Optional[Dict[str, object]] = None) -> bool:
    """Postgres UPSERT keyed on the DataFrame index (``db_tools.py:44-139``)."""
    _require_sqlalchemy()
    from sqlalchemy import text

    if df.index.names == [None] or any(n is None for n in df.index.names):
        df = df.copy()
        df.index.name = df.index.name or "idx"

    idx_cols = list(df.index.names)
    data_cols = list(df.columns)
    all_cols = idx_cols + data_cols

    idx_sql = ", ".join(f'"{c}"' for c in idx_cols)
    all_sql = ", ".join(f'"{c}"' for c in all_cols)
    update_sql = ", ".join(f'"{c}" = EXCLUDED."{c}"' for c in data_cols)

    constraint_name = f"uq_upsert_{table_name}_" + "_".join(idx_cols)
    temp_table = f"tmp_{table_name}_{uuid.uuid4().hex[:6]}"

    with engine.begin() as conn:
        exists = conn.execute(
            text(
                "SELECT EXISTS (SELECT FROM information_schema.tables "
                "WHERE table_schema = :schema AND table_name = :name)"
            ),
            {"schema": schema, "name": table_name},
        ).scalar_one()

        if not exists:
            df.to_sql(table_name, conn, schema=schema, index=True,
                      if_exists="fail", chunksize=chunksize, dtype=dtype)
            conn.execute(
                text(f'ALTER TABLE "{schema}"."{table_name}" '
                     f"ADD CONSTRAINT {constraint_name} UNIQUE ({idx_sql})")
            )
            return True

        df.to_sql(temp_table, conn, schema=schema, index=True,
                  if_exists="replace", chunksize=chunksize, dtype=dtype)
        conn.execute(
            text(f'ALTER TABLE "{schema}"."{table_name}" '
                 f"DROP CONSTRAINT IF EXISTS {constraint_name}")
        )
        conn.execute(
            text(f'ALTER TABLE "{schema}"."{table_name}" '
                 f"ADD CONSTRAINT {constraint_name} UNIQUE ({idx_sql})")
        )
        conn.execute(
            text(
                f'INSERT INTO "{schema}"."{table_name}" ({all_sql}) '
                f'SELECT {all_sql} FROM "{schema}"."{temp_table}" '
                f"ON CONFLICT ({idx_sql}) DO UPDATE SET {update_sql}"
            )
        )
        conn.execute(text(f'DROP TABLE "{schema}"."{temp_table}"'))
    return True
