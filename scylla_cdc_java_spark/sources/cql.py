"""CQL connectivity surface: session configuration, consistency levels,
replica ordering — the reference's largest non-file surface, modeled
without a live cluster.

Mirrors the reference's configuration and policy layer exactly
(scylla-cdc-base/src/main/java/com/scylladb/cdc/cql/CQLConfiguration.java,
cql/ReplicaOrdering.java:7-11, SslConfig; scylla-cdc-driver3/.../
Driver3Session.java:31-56 policy wiring; Driver3MasterCQL.computeCL,
Driver3MasterCQL.java:254-257). The *connection* itself is deliberately
out of scope for this file-based engine (SURVEY §4): ``connect()`` is
gated behind an import-try for a CQL driver, and ``to_spark_options()``
translates the validated configuration into the public Spark-Cassandra
connector's option keys so a user with a live cluster can point the same
configuration at ``spark.read.format("org.apache.spark.sql.cassandra")``.

Everything validating/ordering here is pure Python and fully tested
offline; nothing network-touching executes unless a driver is installed.
"""

from __future__ import annotations

import enum
import random
from dataclasses import dataclass, field


class ConsistencyLevel(enum.Enum):
    """Read consistency for CDC-log queries (CQLConfiguration.java:116-127
    documents the levels; QUORUM is the reference default). Queries to
    system tables (stream descriptions) do not respect this setting —
    they use the auto metadata CL (``compute_metadata_cl``)."""

    LOCAL_ONE = "LOCAL_ONE"
    ONE = "ONE"
    TWO = "TWO"
    THREE = "THREE"
    LOCAL_QUORUM = "LOCAL_QUORUM"
    QUORUM = "QUORUM"
    ALL = "ALL"


class ReplicaOrdering(enum.Enum):
    """How reads iterate over data replicas (cql/ReplicaOrdering.java:7-11
    — a driver-type-free copy of TokenAwarePolicy.ReplicaOrdering)."""

    TOPOLOGICAL = "TOPOLOGICAL"
    RANDOM = "RANDOM"
    NEUTRAL = "NEUTRAL"


@dataclass(frozen=True)
class SslConfig:
    """TLS knobs the reference exposes (Driver3Session SslContext wiring)."""

    provider: str = "JDK"
    trust_store_path: str | None = None
    trust_store_password: str | None = None
    key_store_path: str | None = None
    key_store_password: str | None = None
    cipher_suites: tuple[str, ...] = ()


@dataclass(frozen=True)
class Replica:
    """One replica endpoint with its topology coordinates."""

    host: str
    port: int = 9042
    dc: str | None = None
    rack: str | None = None


DEFAULT_PORT = 9042
DEFAULT_CONSISTENCY_LEVEL = ConsistencyLevel.QUORUM


@dataclass(frozen=True)
class CQLConfiguration:
    """Validated CQL session configuration (CQLConfiguration.java).

    Invariants enforced exactly as the reference's constructor does:
    at least one contact point; credentials are both-or-neither;
    consistency level and replica ordering are non-null (defaulted).
    Build via :class:`CQLConfigurationBuilder` / ``builder()``.
    """

    contact_points: tuple[tuple[str, int], ...]
    user: str | None = None
    password: str | None = None
    consistency_level: ConsistencyLevel = DEFAULT_CONSISTENCY_LEVEL
    local_dc_name: str | None = None
    local_rack_name: str | None = None
    replica_ordering: ReplicaOrdering = ReplicaOrdering.RANDOM
    ssl_config: SslConfig | None = None
    query_options_fetch_size: int = 0
    core_pool_local: int | None = None
    max_pool_local: int | None = None
    pooling_max_queue_size: int | None = None
    pooling_max_requests_per_connection_local: int | None = None
    pool_timeout_millis: int | None = None
    default_port: int = DEFAULT_PORT

    def __post_init__(self) -> None:
        if not self.contact_points:
            raise ValueError("at least one contact point is required")
        if (self.user is None) != (self.password is None):
            raise ValueError("credentials must be provided as a user-password pair")

    def to_spark_options(self, keyspace: str, table: str) -> dict[str, str]:
        """Translate into Spark-Cassandra connector reader options (the
        public ``spark.cassandra.*`` keys), so the same validated config
        drives ``spark.read.format('org.apache.spark.sql.cassandra')``
        against a live cluster."""
        opts = {
            "spark.cassandra.connection.host": ",".join(
                h for h, _ in self.contact_points
            ),
            "spark.cassandra.connection.port": str(self.contact_points[0][1]),
            "spark.cassandra.input.consistency.level": self.consistency_level.value,
            "keyspace": keyspace,
            "table": table,
        }
        if self.user is not None:
            opts["spark.cassandra.auth.username"] = self.user
            opts["spark.cassandra.auth.password"] = self.password or ""
        if self.local_dc_name is not None:
            opts["spark.cassandra.connection.localDC"] = self.local_dc_name
        if self.query_options_fetch_size > 0:
            opts["spark.cassandra.input.fetch.sizeInRows"] = str(
                self.query_options_fetch_size
            )
        if self.ssl_config is not None:
            opts["spark.cassandra.connection.ssl.enabled"] = "true"
            if self.ssl_config.trust_store_path:
                opts["spark.cassandra.connection.ssl.trustStore.path"] = (
                    self.ssl_config.trust_store_path
                )
        return opts


@dataclass
class CQLConfigurationBuilder:
    """Fluent builder matching CQLConfiguration.Builder's surface and
    defaults (port 9042, QUORUM, RANDOM ordering, fetch size 0)."""

    _contact_points: list[tuple[str, int]] = field(default_factory=list)
    _default_port: int = DEFAULT_PORT
    _user: str | None = None
    _password: str | None = None
    _cl: ConsistencyLevel = DEFAULT_CONSISTENCY_LEVEL
    _local_dc: str | None = None
    _local_rack: str | None = None
    _ordering: ReplicaOrdering = ReplicaOrdering.RANDOM
    _ssl: SslConfig | None = None
    _fetch_size: int = 0
    _core_pool_local: int | None = None
    _max_pool_local: int | None = None
    _pooling_max_queue_size: int | None = None
    _pooling_max_requests: int | None = None
    _pool_timeout_millis: int | None = None

    def with_default_port(self, port: int) -> "CQLConfigurationBuilder":
        """To be set BEFORE add_contact_point (reference Builder docs)."""
        self._default_port = self._check_port(port)
        return self

    @staticmethod
    def _check_port(port: int) -> int:
        if not 0 < port < 65536:
            raise ValueError(f"port out of range: {port}")
        return port

    def add_contact_point(
        self, host: str, port: int | None = None
    ) -> "CQLConfigurationBuilder":
        if not host:
            raise ValueError("contact point host must be non-empty")
        self._contact_points.append(
            (host, self._check_port(port) if port is not None else self._default_port)
        )
        return self

    def add_contact_points(self, points) -> "CQLConfigurationBuilder":
        for p in points:
            if isinstance(p, str):
                self.add_contact_point(p)
            else:
                self.add_contact_point(*p)
        return self

    def with_credentials(self, user: str, password: str) -> "CQLConfigurationBuilder":
        if user is None or password is None:
            raise ValueError("credentials must be a user-password pair")
        self._user, self._password = user, password
        return self

    def with_consistency_level(
        self, cl: ConsistencyLevel
    ) -> "CQLConfigurationBuilder":
        if cl is None:
            raise ValueError("consistency level must not be None")
        self._cl = cl
        return self

    def with_local_dc(self, dc: str) -> "CQLConfigurationBuilder":
        self._local_dc = dc
        return self

    def with_local_rack(self, rack: str) -> "CQLConfigurationBuilder":
        self._local_rack = rack
        return self

    def with_replica_ordering(
        self, ordering: ReplicaOrdering
    ) -> "CQLConfigurationBuilder":
        if ordering is None:
            raise ValueError("replica ordering must not be None")
        self._ordering = ordering
        return self

    def with_ssl(self, ssl: SslConfig) -> "CQLConfigurationBuilder":
        self._ssl = ssl
        return self

    def with_fetch_size(self, n: int) -> "CQLConfigurationBuilder":
        self._fetch_size = int(n)
        return self

    def with_pooling(
        self,
        core_pool_local: int | None = None,
        max_pool_local: int | None = None,
        max_queue_size: int | None = None,
        max_requests_per_connection_local: int | None = None,
        pool_timeout_millis: int | None = None,
    ) -> "CQLConfigurationBuilder":
        self._core_pool_local = core_pool_local
        self._max_pool_local = max_pool_local
        self._pooling_max_queue_size = max_queue_size
        self._pooling_max_requests = max_requests_per_connection_local
        self._pool_timeout_millis = pool_timeout_millis
        return self

    def build(self) -> CQLConfiguration:
        return CQLConfiguration(
            contact_points=tuple(self._contact_points),
            user=self._user,
            password=self._password,
            consistency_level=self._cl,
            local_dc_name=self._local_dc,
            local_rack_name=self._local_rack,
            replica_ordering=self._ordering,
            ssl_config=self._ssl,
            query_options_fetch_size=self._fetch_size,
            core_pool_local=self._core_pool_local,
            max_pool_local=self._max_pool_local,
            pooling_max_queue_size=self._pooling_max_queue_size,
            pooling_max_requests_per_connection_local=self._pooling_max_requests,
            pool_timeout_millis=self._pool_timeout_millis,
            default_port=self._default_port,
        )


def builder() -> CQLConfigurationBuilder:
    return CQLConfigurationBuilder()


def compute_metadata_cl(n_hosts: int) -> ConsistencyLevel:
    """Auto CL for system-table (generation metadata) reads: QUORUM on a
    real cluster, ONE on a single node (Driver3MasterCQL.computeCL,
    Driver3MasterCQL.java:254-257)."""
    return ConsistencyLevel.QUORUM if n_hosts > 1 else ConsistencyLevel.ONE


def order_replicas(
    replicas: list[Replica],
    ordering: ReplicaOrdering,
    local_dc: str | None = None,
    local_rack: str | None = None,
    seed: int | None = None,
) -> list[Replica]:
    """Iterate replicas per the configured ordering — the policy the
    reference wires into TokenAwarePolicy (Driver3Session.java:31-56;
    ReplicaOrdering semantics from the driver's TokenAwarePolicy):

    * TOPOLOGICAL — local-rack replicas first, then local-DC, then the
      rest; stable within each tier (deterministic).
    * RANDOM — a (seedable) shuffle: spreads read load across replicas.
    * NEUTRAL — the replica set's natural (token) order, untouched.
    """
    if ordering is ReplicaOrdering.NEUTRAL:
        return list(replicas)
    if ordering is ReplicaOrdering.RANDOM:
        out = list(replicas)
        random.Random(seed).shuffle(out)
        return out

    def tier(r: Replica) -> int:
        if local_dc is not None and r.dc == local_dc:
            if local_rack is not None and r.rack == local_rack:
                return 0
            return 1
        return 2

    return sorted(replicas, key=lambda r: (tier(r), replicas.index(r)))


class CQLSession:
    """Session-building analog of Driver3Session (Driver3Session.java:31-56).

    Holds a validated :class:`CQLConfiguration`; ``connect()`` requires a
    CQL driver package (not shipped in this engine's environment) and is
    gated behind an import-try, mirroring the strict-mode media decoders.
    ``spark_reader_options`` is the supported path: hand the options to
    the (public) Spark-Cassandra connector and let Spark's DSv2 machinery
    do the distributed reads."""

    def __init__(self, config: CQLConfiguration):
        self.config = config

    def spark_reader_options(self, keyspace: str, table: str) -> dict[str, str]:
        return self.config.to_spark_options(keyspace, table)

    def connect(self):
        try:
            import cassandra  # noqa: F401  (not installed here by design)
        except ImportError as exc:
            raise NotImplementedError(
                "live CQL connectivity requires a CQL driver package; this "
                "file-based engine ships the configuration/policy layer only — "
                "use spark_reader_options() with the Spark-Cassandra connector"
            ) from exc
        raise NotImplementedError(
            "driver detected, but live session wiring is not implemented in "
            "this engine; use spark_reader_options()"
        )
