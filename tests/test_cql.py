"""CQL configuration/policy layer (reference CQLConfiguration.java,
ReplicaOrdering.java, Driver3MasterCQL.computeCL, Driver3Session policy
wiring) — pure-Python, no cluster required."""

from __future__ import annotations

import pytest

from scylla_cdc_java_spark.sources.cql import (
    ConsistencyLevel,
    CQLSession,
    Replica,
    ReplicaOrdering,
    SslConfig,
    builder,
    compute_metadata_cl,
    order_replicas,
)


def test_builder_defaults_match_reference():
    cfg = builder().add_contact_point("db1.example.com").build()
    assert cfg.contact_points == (("db1.example.com", 9042),)
    assert cfg.consistency_level is ConsistencyLevel.QUORUM  # reference default
    assert cfg.replica_ordering is ReplicaOrdering.RANDOM
    assert cfg.query_options_fetch_size == 0
    assert cfg.user is None and cfg.password is None


def test_builder_validation_matches_reference_preconditions():
    with pytest.raises(ValueError):
        builder().build()  # no contact points
    with pytest.raises(ValueError):
        builder().add_contact_point("h", 0)  # port range
    with pytest.raises(ValueError):
        builder().add_contact_point("h", 70000)
    # credentials are both-or-neither (CQLConfiguration ctor precondition)
    from scylla_cdc_java_spark.sources.cql import CQLConfiguration

    with pytest.raises(ValueError):
        CQLConfiguration(contact_points=(("h", 9042),), user="u", password=None)


def test_default_port_applies_to_later_contact_points():
    cfg = (
        builder()
        .with_default_port(19042)
        .add_contact_point("a")
        .add_contact_point("b", 9999)
        .build()
    )
    assert cfg.contact_points == (("a", 19042), ("b", 9999))


def test_compute_metadata_cl():
    """QUORUM on a multi-node cluster, ONE single-node
    (Driver3MasterCQL.java:254-257)."""
    assert compute_metadata_cl(1) is ConsistencyLevel.ONE
    assert compute_metadata_cl(3) is ConsistencyLevel.QUORUM


REPLICAS = [
    Replica("r1", dc="dc2", rack="a"),
    Replica("r2", dc="dc1", rack="b"),
    Replica("r3", dc="dc1", rack="a"),
    Replica("r4", dc="dc2", rack="b"),
]


def test_replica_ordering_neutral_preserves_token_order():
    assert order_replicas(REPLICAS, ReplicaOrdering.NEUTRAL) == REPLICAS


def test_replica_ordering_topological_tiers():
    out = order_replicas(
        REPLICAS, ReplicaOrdering.TOPOLOGICAL, local_dc="dc1", local_rack="a"
    )
    assert [r.host for r in out] == ["r3", "r2", "r1", "r4"]
    # no rack configured: local-DC replicas lead, stable within tiers
    out = order_replicas(REPLICAS, ReplicaOrdering.TOPOLOGICAL, local_dc="dc2")
    assert [r.host for r in out] == ["r1", "r4", "r2", "r3"]


def test_replica_ordering_random_is_seedable_permutation():
    a = order_replicas(REPLICAS, ReplicaOrdering.RANDOM, seed=7)
    b = order_replicas(REPLICAS, ReplicaOrdering.RANDOM, seed=7)
    assert a == b
    assert sorted(r.host for r in a) == sorted(r.host for r in REPLICAS)


def test_spark_reader_options_mapping():
    cfg = (
        builder()
        .add_contact_points(["h1", ("h2", 9042)])
        .with_credentials("scylla", "secret")
        .with_consistency_level(ConsistencyLevel.LOCAL_QUORUM)
        .with_local_dc("dc1")
        .with_fetch_size(5000)
        .with_ssl(SslConfig(trust_store_path="/tls/truststore"))
        .build()
    )
    opts = CQLSession(cfg).spark_reader_options("ks", "tbl_scylla_cdc_log")
    assert opts["spark.cassandra.connection.host"] == "h1,h2"
    assert opts["spark.cassandra.input.consistency.level"] == "LOCAL_QUORUM"
    assert opts["spark.cassandra.auth.username"] == "scylla"
    assert opts["spark.cassandra.connection.localDC"] == "dc1"
    assert opts["spark.cassandra.input.fetch.sizeInRows"] == "5000"
    assert opts["spark.cassandra.connection.ssl.enabled"] == "true"
    assert opts["keyspace"] == "ks" and opts["table"] == "tbl_scylla_cdc_log"


def test_connect_is_gated_without_driver():
    cfg = builder().add_contact_point("h").build()
    with pytest.raises(NotImplementedError, match="configuration/policy layer"):
        CQLSession(cfg).connect()
