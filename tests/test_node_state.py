"""Node/index status state machine unit tests (parity with the reference's
node_state.rs:229-698 inline tests)."""

from vector_store_tpu.db.fake import make_vs_metadata
from vector_store_tpu.service.node_state import (
    IndexStatus,
    NodeState,
    NodeStatus,
    index_status_http,
    node_status_http,
)


def md(name):
    return make_vs_metadata(index=name)


class TestNodeLifecycle:
    def test_happy_path(self):
        ns = NodeState()
        assert ns.get_status() is NodeStatus.INITIALIZING
        ns.connecting_to_db()
        assert ns.get_status() is NodeStatus.CONNECTING_TO_DB
        ns.connected_to_db()
        ns.discovering_indexes()
        assert ns.get_status() is NodeStatus.DISCOVERING_INDEXES
        a, b = md("a"), md("b")
        ns.indexes_discovered({a, b})
        assert ns.get_status() is NodeStatus.INDEXING_EMBEDDINGS
        ns.full_scan_started(a)
        assert ns.get_index_status("ks", "a") is IndexStatus.FULL_SCANNING
        ns.full_scan_finished(a)
        assert ns.get_index_status("ks", "a") is IndexStatus.SERVING
        assert ns.get_status() is NodeStatus.INDEXING_EMBEDDINGS  # b pending
        ns.full_scan_finished(b)
        assert ns.get_status() is NodeStatus.SERVING

    def test_no_initial_indexes(self):
        ns = NodeState()
        ns.connecting_to_db()
        ns.indexes_discovered(set())
        assert ns.get_status() is NodeStatus.SERVING

    def test_index_added_after_serving_does_not_block(self):
        ns = NodeState()
        ns.indexes_discovered(set())
        assert ns.get_status() is NodeStatus.SERVING
        c = md("c")
        ns.indexes_discovered({c})
        # a later index keeps the node serving (only the INITIAL set gates)
        assert ns.get_status() is NodeStatus.SERVING
        assert ns.get_index_status("ks", "c") is IndexStatus.INITIALIZING

    def test_initial_index_dropped_releases_node(self):
        ns = NodeState()
        a, b = md("a"), md("b")
        ns.indexes_discovered({a, b})
        ns.full_scan_finished(a)
        assert ns.get_status() is not NodeStatus.SERVING
        # b is dropped before its scan finishes: node can serve
        ns.indexes_discovered({a})
        assert ns.get_status() is NodeStatus.SERVING

    def test_unknown_index_status_none(self):
        ns = NodeState()
        assert ns.get_index_status("ks", "nope") is None

    def test_discovering_after_initial_set_done(self):
        ns = NodeState()
        ns.indexes_discovered(set())
        ns2 = NodeState()
        ns2.connecting_to_db()
        ns2.connected_to_db()  # DISCOVERING requires a live DB session
        ns2.discovering_indexes()
        assert ns2.get_status() is NodeStatus.DISCOVERING_INDEXES


class TestHttpMapping:
    def test_node_statuses(self):
        assert node_status_http(NodeStatus.INITIALIZING) == "INITIALIZING"
        assert node_status_http(NodeStatus.CONNECTING_TO_DB) == "CONNECTING_TO_DB"
        assert node_status_http(NodeStatus.DISCOVERING_INDEXES) == "BOOTSTRAPPING"
        assert node_status_http(NodeStatus.INDEXING_EMBEDDINGS) == "BOOTSTRAPPING"
        assert node_status_http(NodeStatus.SERVING) == "SERVING"

    def test_index_statuses(self):
        assert index_status_http(IndexStatus.INITIALIZING) == "INITIALIZING"
        assert index_status_http(IndexStatus.FULL_SCANNING) == "BOOTSTRAPPING"
        assert index_status_http(IndexStatus.SERVING) == "SERVING"
