"""Control-plane and runtime services (host-side, asyncio).

Python equivalents of the reference's tokio actors: node/index status state
machine (node_state.rs), index registry + query routing (indexes.rs), index
lifecycle (engine.rs), pipeline pump (monitor_items.rs), VS index actor with
device-batch scheduling (vs_index/), memory governor (memory.rs), Prometheus
metrics (metrics.rs), and debug counters (internals.rs).
"""
