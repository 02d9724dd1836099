"""Owner-process IPC: a binary unix-socket protocol between HTTP frontend
workers and the device-owner process.

Why: one Python event loop doing HTTP+JSON caps serving at a few hundred
QPS (GIL) while the device engine sustains tens of thousands. The fix is
the classic sidecar split: N frontend processes own HTTP/JSON parsing and
fan requests over persistent unix sockets to the single owner process that
holds the TPU engines. The owner's per-request cost drops to a pickle
decode + actor dispatch.

Framing: 4-byte big-endian length + pickle (protocol 5). Vectors travel as
raw float32 bytes inside the payload.
"""

from __future__ import annotations

import asyncio
import logging
import pickle
import struct
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_LEN = struct.Struct("!I")


async def read_msg(reader: asyncio.StreamReader):
    header = await reader.readexactly(4)
    (n,) = _LEN.unpack(header)
    return pickle.loads(await reader.readexactly(n))


def write_msg(writer: asyncio.StreamWriter, obj) -> None:
    payload = pickle.dumps(obj, protocol=5)
    writer.write(_LEN.pack(len(payload)) + payload)


class OwnerIpcServer:
    """Runs inside the service (owner) process; executes frontend commands
    against the live registry/actors."""

    def __init__(self, service, path: str) -> None:
        self.service = service
        self.path = path
        self._server: asyncio.AbstractServer | None = None

    async def start(self) -> None:
        self._server = await asyncio.start_unix_server(self._client, path=self.path)

    async def stop(self) -> None:
        if self._server:
            self._server.close()
            await self._server.wait_closed()

    async def _client(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        try:
            while True:
                req_id, cmd, args = await read_msg(reader)
                # handle concurrently so one slow search doesn't serialize
                # the whole connection
                asyncio.get_running_loop().create_task(
                    self._dispatch(writer, req_id, cmd, args)
                )
        except (asyncio.IncompleteReadError, ConnectionError):
            pass
        except Exception:
            logger.exception("ipc server connection loop failed")
        finally:
            writer.close()

    async def _dispatch(self, writer, req_id, cmd, args) -> None:
        try:
            result = await self._execute(cmd, args)
            write_msg(writer, (req_id, None, result))
        except Exception as e:  # error travels back as (type, message)
            write_msg(writer, (req_id, f"{type(e).__name__}: {e}", None))
        try:
            await writer.drain()
        except (ConnectionError, RuntimeError):
            pass

    async def _execute(self, cmd: str, args):
        from vector_store_tpu.http import routes as r
        from vector_store_tpu.service.indexes import BestIndexKind
        from vector_store_tpu.service.node_state import (
            IndexStatus,
            NodeStatus,
            index_status_http,
            node_status_http,
        )

        svc = self.service
        if cmd == "status":
            return node_status_http(svc.node_state.get_status())
        if cmd == "info":
            import vector_store_tpu

            return {
                "engine": "vector-store-tpu",
                "service": vector_store_tpu.SERVICE_NAME,
                "version": vector_store_tpu.__version__,
            }
        if cmd == "metrics_text":
            return svc.metrics.expose_text()
        if cmd == "counters":
            return svc.internals.counters()
        if cmd == "indexes_list":
            # reuse the JSON shape the route builds
            out = []
            for key, entry in svc.indexes.vs_entries.items():
                vs = entry.metadata.vs_options
                out.append(
                    {
                        "keyspace": key.keyspace,
                        "index": key.index,
                        "options": {
                            "type": "vector",
                            "dimensions": int(vs.dimensions),
                            "maximum_node_connections": int(vs.connectivity),
                            "construction_beam_width": int(vs.expansion_add),
                            "search_beam_width": int(vs.expansion_search),
                            "similarity_function": r._similarity_name(vs.space_type),
                            "quantization": vs.quantization.value,
                        },
                    }
                )
            for key, entry in svc.indexes.fts_entries.items():
                out.append(
                    {
                        "keyspace": key.keyspace,
                        "index": key.index,
                        "options": {
                            "type": "fulltext",
                            "analyzer": "standard",
                            "positions": False,
                        },
                    }
                )
            return out
        if cmd == "index_status":
            ks, ix = args["keyspace"], args["index"]
            entry = svc.indexes.get_vs((ks, ix)) or svc.indexes.get_fts((ks, ix))
            if entry is None:
                return {"error": 404, "message": f"missing index: {ks}.{ix}"}
            count = await entry.actor.count()
            return {
                "status": index_status_http(entry.status),
                "count": count,
                "build_progress": entry.progress.percentage,
            }
        if cmd == "ann":
            return await self._ann(args)
        if cmd == "ann_batch":
            return await self._ann_batch(args)
        if cmd == "bm25":
            return await self._bm25(args)
        raise ValueError(f"unknown ipc command {cmd}")

    async def _ann(self, args):
        """Same decision flow as http.routes.post_index_ann, minus HTTP."""
        from vector_store_tpu.core.distance import similarity_score
        from vector_store_tpu.http.routes import (
            coerce_restrictions,
            parse_filter,
            restriction_columns,
        )
        from vector_store_tpu.service.indexes import BestIndexKind
        from vector_store_tpu.service.node_state import NodeStatus
        from vector_store_tpu.service.vs_index import DimensionMismatch

        svc = self.service
        ks, ix = args["keyspace"], args["index"]
        vector = np.frombuffer(args["vector"], dtype=np.float32)
        limit = args["limit"]
        filter_data = args.get("filter")
        timer = svc.metrics.latency.with_labels(ks, ix).start_timer()
        try:
            restrictions, allow_filtering = (
                parse_filter(filter_data) if filter_data else ([], False)
            )
            equality, range_ = restriction_columns(restrictions)
            best = svc.indexes.best_index((ks, ix), equality, range_)
            if best.kind is BestIndexKind.NOT_FOUND:
                return {"error": 404, "message": f"missing index: {ks}.{ix}"}
            if best.kind is BestIndexKind.NO_GLOBAL_INDEX:
                return {
                    "error": 400,
                    "message": (
                        "Global ANN query is not supported when only a local "
                        f"vector index is available for {ks}.{ix}"
                    ),
                }
            if best.kind is BestIndexKind.NOT_SERVING:
                progress = best.progress.percentage if best.progress else 0.0
                if svc.node_state.get_status() is NodeStatus.SERVING:
                    reason = {
                        "reason": "INDEX_BUILDING",
                        "message": (
                            f"Index {ks}.{ix} is not available yet as it is "
                            f"still being constructed, progress: {progress:.3f}%"
                        ),
                    }
                else:
                    reason = {"reason": "NODE_BOOTSTRAPPING"}
                return {"error": 503, "reason": reason}
            if best.needs_filtering > 0 and not allow_filtering:
                return {
                    "error": 400,
                    "message": f"Index {ks}.{ix} requires ALLOW FILTERING for this query",
                }
            svc.internals.increment(
                f"ann-served-request--{best.key.keyspace}--{best.key.index}"
            )
            entry = best.entry
            if restrictions:
                restrictions = coerce_restrictions(
                    restrictions, getattr(entry, "table_columns", {})
                )
                result = await entry.actor.filtered_ann(
                    vector.tolist(), restrictions, limit
                )
            else:
                result = await entry.actor.ann(vector.tolist(), limit)
        except DimensionMismatch as e:
            return {"error": 400, "message": str(e)}
        except ValueError as e:
            return {"error": 400, "message": str(e)}
        finally:
            timer.observe_duration()
        return {
            "pk_columns": entry.metadata.primary_key_columns,
            "keys": [pk.values() for pk, _ in result],
            "distances": [d.value for _, d in result],
            "similarities": [similarity_score(d) for _, d in result],
        }

    async def _ann_batch(self, args):
        """Bulk unfiltered ANN: one IPC message carries n query vectors for
        one index; routing/metrics run once and results travel back in one
        pickle. This removes the per-request asyncio/pickle overhead that
        capped per-request IPC at ~500 QPS."""
        from vector_store_tpu.core.distance import similarity_score
        from vector_store_tpu.service.indexes import BestIndexKind
        from vector_store_tpu.service.node_state import NodeStatus
        from vector_store_tpu.service.vs_index import DimensionMismatch

        svc = self.service
        ks, ix = args["keyspace"], args["index"]
        n = args["n"]
        d = args["dims"]
        vectors = np.frombuffer(args["vectors"], dtype=np.float32).reshape(n, d)
        limit = args["limit"]
        timer = svc.metrics.latency.with_labels(ks, ix).start_timer()
        try:
            best = svc.indexes.best_index((ks, ix), [], [])
            if best.kind is BestIndexKind.NOT_FOUND:
                return {"error": 404, "message": f"missing index: {ks}.{ix}"}
            if best.kind is BestIndexKind.NO_GLOBAL_INDEX:
                return {
                    "error": 400,
                    "message": (
                        "Global ANN query is not supported when only a local "
                        f"vector index is available for {ks}.{ix}"
                    ),
                }
            if best.kind is BestIndexKind.NOT_SERVING:
                progress = best.progress.percentage if best.progress else 0.0
                if svc.node_state.get_status() is NodeStatus.SERVING:
                    reason = {
                        "reason": "INDEX_BUILDING",
                        "message": (
                            f"Index {ks}.{ix} is not available yet as it is "
                            f"still being constructed, progress: {progress:.3f}%"
                        ),
                    }
                else:
                    reason = {"reason": "NODE_BOOTSTRAPPING"}
                return {"error": 503, "reason": reason}
            svc.internals.increment(
                f"ann-served-request--{best.key.keyspace}--{best.key.index}", n
            )
            entry = best.entry
            results = await entry.actor.ann_many(vectors, limit)
        except DimensionMismatch as e:
            return {"error": 400, "message": str(e)}
        finally:
            timer.observe_duration()
        return {
            "pk_columns": entry.metadata.primary_key_columns,
            "results": [
                (
                    [pk.values() for pk, _ in res],
                    [d.value for _, d in res],
                    [similarity_score(d) for _, d in res],
                )
                for res in results
            ],
        }

    async def _bm25(self, args):
        from vector_store_tpu.service.node_state import IndexStatus, NodeStatus

        svc = self.service
        ks, ix = args["keyspace"], args["index"]
        entry = svc.indexes.get_fts((ks, ix))
        if entry is None:
            return {"error": 404, "message": f"missing index: {ks}.{ix}"}
        if entry.status is not IndexStatus.SERVING:
            progress = entry.progress.percentage
            if svc.node_state.get_status() is NodeStatus.SERVING:
                reason = {
                    "reason": "INDEX_BUILDING",
                    "message": (
                        f"Index {ks}.{ix} is not available yet as it is "
                        f"still being constructed, progress: {progress:.3f}%"
                    ),
                }
            else:
                reason = {"reason": "NODE_BOOTSTRAPPING"}
            return {"error": 503, "reason": reason}
        keys, scores = await entry.actor.search(args["query"], args["limit"])
        return {
            "pk_columns": entry.metadata.primary_key_columns,
            "keys": [pk.values() for pk in keys],
            "scores": scores,
        }


class IpcClient:
    """Persistent connection pool used by frontend workers."""

    def __init__(self, path: str, pool: int = 4) -> None:
        self.path = path
        self.pool_size = pool
        self._conns: list[tuple[asyncio.StreamReader, asyncio.StreamWriter]] = []
        self._pending: dict[int, asyncio.Future] = {}
        self._next_id = 0
        self._rr = 0
        self._lock = asyncio.Lock()

    async def connect(self) -> None:
        for _ in range(self.pool_size):
            reader, writer = await asyncio.open_unix_connection(self.path)
            self._conns.append((reader, writer))
            asyncio.get_running_loop().create_task(self._read_loop(reader))

    async def close(self) -> None:
        for _, writer in self._conns:
            writer.close()

    async def _read_loop(self, reader: asyncio.StreamReader) -> None:
        try:
            while True:
                req_id, err, result = await read_msg(reader)
                fut = self._pending.pop(req_id, None)
                if fut and not fut.done():
                    if err is not None:
                        fut.set_exception(RuntimeError(err))
                    else:
                        fut.set_result(result)
        except (asyncio.IncompleteReadError, ConnectionError):
            logger.warning("ipc client reader: connection to owner lost")
            for fut in self._pending.values():
                if not fut.done():
                    fut.set_exception(ConnectionError("ipc connection lost"))
            self._pending.clear()
        except Exception:
            logger.exception("ipc client reader failed")
            for fut in self._pending.values():
                if not fut.done():
                    fut.set_exception(ConnectionError("ipc reader error"))
            self._pending.clear()

    async def call(self, cmd: str, args) -> object:
        async with self._lock:
            self._next_id += 1
            req_id = self._next_id
            self._rr = (self._rr + 1) % len(self._conns)
            _, writer = self._conns[self._rr]
            fut = asyncio.get_running_loop().create_future()
            self._pending[req_id] = fut
            write_msg(writer, (req_id, cmd, args))
            await writer.drain()
        return await fut
