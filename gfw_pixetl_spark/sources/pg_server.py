"""Session-scoped throwaway PostgreSQL server for the S6 live scan path.

The reference executes its vector SQL against a dockerized PostGIS
cluster (reference ``docker-compose.test.yml:1-70``); this container
ships real PostgreSQL 15 binaries but no PostGIS extension and no JDBC
jar. The live S6 leg therefore runs against a throwaway local cluster
(initdb under an unprivileged uid, unix-socket only) with the PL/pgSQL
ST_* polyfill from ``pg_live.py`` installed — genuine PostgreSQL grammar,
planner, and float8 wire round-trips; only the geometry kernels are the
polyfill (semantics replayed operation-for-operation from
``functions/geometry.py``).

``ensure_server()`` lazily boots one cluster per driver process and
keeps it up for the session (atexit teardown): harness queries and the
``gfw_pg_tiles`` DataSource share it. Executor-side readers connect via
psql over the unix socket — on a multi-host cluster the same DataSource
takes host/port options instead (contract documented in
``pg_datasource.py``).
"""

from __future__ import annotations

import atexit
import os
import shutil
import subprocess
import tempfile

from .pg_live import POLYFILL_DDL

_PORT = "54331"
_UID = "1000"
_STATE: dict = {}


def available() -> bool:
    return all(
        shutil.which(b) for b in ("initdb", "pg_ctl", "psql", "setpriv")
    )


def _as_unpriv(base: list[str], home: str) -> list[str]:
    if os.geteuid() != 0:
        return base
    return ["setpriv", f"--reuid={_UID}", f"--regid={_UID}",
            "--clear-groups", "env", f"HOME={home}"] + base


def run_sql(sock: str, sql: str, port: str = _PORT) -> list[list[str]]:
    """Run SQL through psql; rows come back 0x1f-field-separated (the
    byte never appears in the data)."""
    out = subprocess.run(
        ["psql", "-h", sock, "-p", port, "-U", "gfw", "-d", "postgres",
         "-v", "ON_ERROR_STOP=1", "-X", "-qAt", "-F", "\x1f", "-c", sql],
        check=True, capture_output=True, text=True,
    )
    return [ln.split("\x1f") for ln in out.stdout.splitlines() if ln]


def _teardown() -> None:
    st = _STATE.pop("srv", None)
    if not st:
        return
    subprocess.run(
        _as_unpriv(["pg_ctl", "-D", st["data"], "-m", "immediate",
                    "stop"], st["dir"]),
        capture_output=True,
    )
    shutil.rmtree(st["dir"], ignore_errors=True)


def ensure_server() -> dict:
    """Boot (once) and return {'sock': ..., 'port': ...}."""
    st = _STATE.get("srv")
    if st:
        return {"sock": st["sock"], "port": _PORT}
    if not available():
        raise RuntimeError("postgres server binaries not available")
    d = tempfile.mkdtemp(prefix="gfw_pgsrv_", dir="/tmp")
    data, sock = os.path.join(d, "data"), os.path.join(d, "sock")
    os.makedirs(data)
    os.makedirs(sock)
    if os.geteuid() == 0:
        subprocess.run(["chown", "-R", f"{_UID}:{_UID}", d], check=True)
    subprocess.run(
        _as_unpriv(["initdb", "-D", data, "-U", "gfw", "--no-sync",
                    "-A", "trust"], d),
        check=True, capture_output=True)
    subprocess.run(
        _as_unpriv(["pg_ctl", "-D", data, "-l", os.path.join(d, "log"),
                    "-o", f"-k {sock} -p {_PORT} -c listen_addresses=''",
                    "-w", "start"], d),
        check=True, capture_output=True)
    _STATE["srv"] = {"dir": d, "data": data, "sock": sock}
    atexit.register(_teardown)
    run_sql(sock, POLYFILL_DDL)
    run_sql(sock, "CREATE SCHEMA IF NOT EXISTS gfw")
    return {"sock": sock, "port": _PORT}
