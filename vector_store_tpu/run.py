"""Service wiring (parity with reference lib.rs::run + main.rs).

Builds every actor — node_state, internals, memory governor, indexes
registry, engine, schema-discovery monitor, HTTP app — around an injectable
Db (a real ScyllaDB session in production, FakeDb in tests), and runs until
stopped.
"""

from __future__ import annotations

import asyncio
import logging
import os
import signal
from dataclasses import dataclass

from aiohttp import web

from vector_store_tpu.db import Db
from vector_store_tpu.http.routes import AppState, build_app
from vector_store_tpu.service.config import Config, ConfigManager, load_config
from vector_store_tpu.service.engine import Engine
from vector_store_tpu.service.indexes import Indexes
from vector_store_tpu.service.internals import Internals
from vector_store_tpu.service.memory import MemoryGovernor
from vector_store_tpu.service.metrics import Metrics
from vector_store_tpu.service.monitor_indexes import MonitorIndexes
from vector_store_tpu.service.node_state import NodeState

logger = logging.getLogger(__name__)


@dataclass
class Service:
    config: Config
    db: Db
    node_state: NodeState
    internals: Internals
    memory: MemoryGovernor
    metrics: Metrics
    indexes: Indexes
    engine: Engine
    monitor_indexes: MonitorIndexes
    app: web.Application
    http_server: object | None = None  # http.server.HttpServer when bound

    async def stop(self) -> None:
        await self.monitor_indexes.stop()
        await self.engine.stop()
        await self.memory.stop()
        task = getattr(self, "_conn_watch", None)
        if task is not None:
            task.cancel()
        session = getattr(self.db, "session", None)
        if session is not None and hasattr(session, "stop"):
            await session.stop()
        if self.http_server is not None:
            await self.http_server.stop()


def _enable_jax_compile_cache() -> None:
    """Persistent XLA/Mosaic compilation cache: first-compiles of the
    serving kernels cost tens of seconds per (batch, k) shape; the cache
    makes every restart (and every frontend worker) compile-free. Disable
    with VECTOR_STORE_JAX_CACHE=0."""
    path = os.environ.get(
        "VECTOR_STORE_JAX_CACHE",
        os.path.expanduser("~/.cache/vector_store_tpu_jax"),
    )
    if path in ("0", ""):
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a requirement
        logger.debug("jax compilation cache unavailable", exc_info=True)


def make_scylla_db(config: Config, metrics=None, internals=None):
    """Production data plane: pure-python CQL v4 session (reconnect loop,
    auth, TLS) + ScyllaDb schema/scan/CDC driver (db/scylla.py). The
    session starts its reconnect loop on the running event loop; the node
    stays CONNECTING_TO_DB until the first successful handshake
    (reference db.rs:258-367 session actor)."""
    import ssl as ssl_mod

    from vector_store_tpu.db.cql.session import CqlSession
    from vector_store_tpu.db.scylla import ScyllaDb

    password = None
    if config.scylladb_password_file:
        with open(config.scylladb_password_file) as f:
            password = f.read().strip()
    ssl_ctx = None
    if config.scylladb_certificate_file:
        ssl_ctx = ssl_mod.create_default_context(
            cafile=config.scylladb_certificate_file
        )
        ssl_ctx.check_hostname = False
    session = CqlSession(
        config.scylladb_uri,
        username=config.scylladb_username,
        password=password,
        ssl=ssl_ctx,
    )
    session.start()
    return ScyllaDb(
        session,
        cdc_safety_interval=config.cdc_safety_interval,
        cdc_sleep_interval=config.cdc_sleep_interval,
        cdc_fine_safety_interval=config.cdc_fine_safety_interval,
        cdc_fine_sleep_interval=config.cdc_fine_sleep_interval,
        metrics=metrics,
        internals=internals,
    )


async def build_service(db: Db, config: Config | None = None) -> Service:
    config = config or load_config()
    _enable_jax_compile_cache()

    node_state = NodeState()
    internals = Internals()
    memory = MemoryGovernor(limit_bytes=config.memory_limit)
    metrics = Metrics()
    indexes = Indexes()

    from vector_store_tpu.service.worker import Worker

    worker = Worker(threads=config.threads)
    worker.install_as_default(asyncio.get_running_loop())

    engine_kind = config.engine_kind
    if config.usearch_simulator:
        engine_kind = f"sim:{config.usearch_simulator}"
    elif config.opensearch_uri:
        engine_kind = f"opensearch:{config.opensearch_uri}"
    engine = Engine(
        db,
        indexes,
        node_state,
        memory=memory,
        metrics=metrics,
        internals=internals,
        engine_kind=engine_kind,
        shards=config.shards,
    )
    monitor = MonitorIndexes(
        db,
        engine,
        node_state,
        interval=config.monitor_indexes_interval,
        alter_index_simulator=config.alter_index_simulator,
    )

    state = AppState(
        indexes,
        node_state,
        metrics,
        internals,
        engine=engine,
        use_tls=config.use_tls,
    )
    app = build_app(state)

    node_state.connecting_to_db()
    session = getattr(db, "session", None)
    conn_watch = None
    if session is not None and hasattr(session, "_connected"):
        # real driver: CONNECTING_TO_DB until the session handshake lands
        # (auth failures / unreachable DB keep the node in this state —
        # validator auth.rs / connection_timeout.rs semantics)
        async def _watch_connected() -> None:
            await session._connected.wait()
            node_state.connected_to_db()

        conn_watch = asyncio.get_running_loop().create_task(_watch_connected())
    else:
        node_state.connected_to_db()

    memory.start()
    engine.start()
    monitor.start()

    service = Service(
        config=config,
        db=db,
        node_state=node_state,
        internals=internals,
        memory=memory,
        metrics=metrics,
        indexes=indexes,
        engine=engine,
        monitor_indexes=monitor,
        app=app,
    )
    service._conn_watch = conn_watch
    return service


async def serve(db: Db, config: Config | None = None) -> Service:
    """Build the service AND bind the HTTP listener(s): plain or TLS main
    endpoint plus the optional mTLS endpoint, with bind retry and cert
    rotation (http/server.py)."""
    from vector_store_tpu.http.server import HttpServer

    service = await build_service(db, config)
    http_server = HttpServer(service.app, service.config)
    await http_server.start()
    service.http_server = http_server
    return service


async def serve_scaled(
    db: Db,
    config: Config | None = None,
    workers: int = 4,
    ipc_path: str | None = None,
) -> Service:
    """Multi-process serving: this (owner) process keeps exclusive TPU
    ownership and runs ingestion + engines + the binary IPC endpoint; N
    spawned frontend processes bind the HTTP port with SO_REUSEPORT and do
    all HTTP/JSON work, forwarding searches over unix sockets. This is how
    the single-loop Python HTTP ceiling is lifted (the reference's tokio
    runtime is natively multithreaded)."""
    import multiprocessing
    import tempfile

    from vector_store_tpu.http.frontend import frontend_worker_main
    from vector_store_tpu.service.ipc import OwnerIpcServer

    import os

    service = await build_service(db, config)
    cfg = service.config
    if ipc_path is None:
        # private runtime dir: the IPC frames are pickled, so the socket
        # must never be reachable by other local users (mkdtemp is 0700 and
        # race-free, unlike mktemp)
        ipc_dir = tempfile.mkdtemp(prefix="vst-ipc-")
        ipc_path = os.path.join(ipc_dir, "owner.sock")
    ipc_server = OwnerIpcServer(service, ipc_path)
    await ipc_server.start()
    os.chmod(ipc_path, 0o600)
    service.ipc_server = ipc_server  # type: ignore[attr-defined]

    ctx = multiprocessing.get_context("spawn")  # never fork jax/TPU state
    procs = []
    # Frontend workers never touch the device: strip the TPU/accelerator
    # plumbing from their environment so child startup is milliseconds
    # instead of a device-registration handshake (measured: 0.06s vs 6.7s+
    # per process here; the handshake is also weather-dependent, which made
    # worker spawn — and therefore time-to-SERVING — unboundedly slow).
    _device_env = ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "TPU_WORKER_HOSTNAMES")
    saved_env = {}
    for var in _device_env:
        if var in os.environ:
            saved_env[var] = os.environ.pop(var)
    os.environ["JAX_PLATFORMS"] = "cpu"  # belt-and-braces for any jax import
    try:
        for _ in range(workers):
            p = ctx.Process(
                target=frontend_worker_main,
                args=(ipc_path, cfg.host, cfg.port),
                daemon=True,
            )
            p.start()
            procs.append(p)
    finally:
        os.environ.pop("JAX_PLATFORMS", None)
        os.environ.update(saved_env)
    service.frontends = procs  # type: ignore[attr-defined]

    orig_stop = service.stop

    async def stop() -> None:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join(timeout=5)
        await ipc_server.stop()
        await orig_stop()

    service.stop = stop  # type: ignore[method-assign]
    logger.info("scaled serving: %d frontend workers on %s", workers, cfg.uri)
    return service


async def main() -> None:
    # clap-parity: the only CLI flag is --version (reference main.rs:20-22)
    import sys

    import vector_store_tpu

    if "--version" in sys.argv:
        print(f"{vector_store_tpu.SERVICE_NAME} {vector_store_tpu.__version__}")
        return
    logging.basicConfig(level=logging.INFO)
    config_manager = ConfigManager()
    config_manager.install_sighup()
    config = config_manager.config

    # production path: the pure-python CQL wire driver against the
    # configured ScyllaDB cluster (schema discovery, token-range scans,
    # CDC). VECTOR_STORE_FAKE_DB=true boots the in-memory fake instead
    # (demos / tests without a cluster).
    if os.environ.get("VECTOR_STORE_FAKE_DB", "").lower() == "true":
        from vector_store_tpu.db.fake import FakeDb

        db = FakeDb()
        service = await serve(db, config)
    else:
        db = make_scylla_db(config)
        service = await serve(db, config)

    stop = asyncio.Event()
    loop = asyncio.get_running_loop()
    for sig in (signal.SIGINT, signal.SIGTERM):
        loop.add_signal_handler(sig, stop.set)
    await stop.wait()
    await service.stop()


if __name__ == "__main__":
    asyncio.run(main())
