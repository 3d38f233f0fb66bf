"""Single source-of-truth schema for dCache billing records.

The reference declares the record shape twice — a flat 29-name list fed to
``json_tuple`` (`Dcache_kafka_to_hive.py:29-36`) and per-table DDL
(`Dcache_kafka_to_hive.py:162-262`) — with the types only applied by ten
post-hoc casts (`:84-96`). Here one typed ``StructType`` drives a single
``from_json`` parse; the casts disappear because the schema is typed at
parse time.

Type decisions (SURVEY.md §1.2), deliberate deviations from the reference:

- ``queuingTime`` / ``sessionDuration``: LongType everywhere (the reference
  casts to int at parse `:93,95` but declares REAL in 3 of 4 DDLs).
- ``isWrite``: kept as the raw string ("write"/"read") for fidelity with
  the reference's STRING DDL (`:184`); a boolean view is a one-liner.
- ``event_ts``: a real TimestampType parsed from the ISO-8601 ``date``
  string (the reference never parses it, `SUBSTR(date,1,10)` only `:119`);
  the raw string is kept alongside for fidelity.
- ``mappedUID``/``mappedGID``: LongType (UIDs overflow int32 at scale).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Discriminator → route name (≙ the four WHERE clauses at
# `Dcache_kafka_to_hive.py:120,127,134,141`). 'store' and 'restore' share
# the storage ("cinta" = tape) table.
MSG_TYPE_ROUTES: dict[str, str] = {
    "transfer": "transfers",
    "request": "requests",
    "store": "storage",
    "restore": "storage",
    "remove": "removes",
}

PARTITION_FIELD = "partition_date"
# Hive's directory name for a NULL partition value (malformed-date rows)
# — single definition; compact/merge/warehouse all import it from here
DEFAULT_PARTITION_NAME = "__HIVE_DEFAULT_PARTITION__"
REJECTS_ROUTE = "rejects"

STATUS_SCHEMA = T.StructType(
    [
        T.StructField("msg", T.StringType()),
        T.StructField("code", T.IntegerType()),
    ]
)

PROTOCOL_INFO_SCHEMA = T.StructType(
    [
        T.StructField("protocol", T.StringType()),
        T.StructField("port", T.IntegerType()),
        T.StructField("host", T.StringType()),
    ]
)

# Union of every top-level key a billing JSON message can carry
# (≙ INPUT_FIELDS `Dcache_kafka_to_hive.py:29-36`), typed once.
BILLING_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("msgType", T.StringType()),
        T.StructField("cellName", T.StringType()),
        T.StructField("session", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("initiator", T.StringType()),
        T.StructField("transferPath", T.StringType()),
        T.StructField("queuingTime", T.LongType()),
        T.StructField("cellDomain", T.StringType()),
        T.StructField("isP2p", T.BooleanType()),
        T.StructField("transferTime", T.DoubleType()),
        T.StructField("storageInfo", T.StringType()),
        T.StructField("transferSize", T.DoubleType()),
        T.StructField("localEndpoint", T.StringType()),
        T.StructField("protocolInfo", PROTOCOL_INFO_SCHEMA),
        T.StructField("cellType", T.StringType()),
        T.StructField("fileSize", T.DoubleType()),
        T.StructField("pnfsid", T.StringType()),
        T.StructField("billingPath", T.StringType()),
        T.StructField("isWrite", T.StringType()),
        T.StructField("status", STATUS_SCHEMA),
        T.StructField("owner", T.StringType()),
        T.StructField("clientChain", T.StringType()),
        T.StructField("mappedGID", T.LongType()),
        T.StructField("sessionDuration", T.LongType()),
        T.StructField("mappedUID", T.LongType()),
        T.StructField("client", T.StringType()),
        T.StructField("locations", T.StringType()),
        T.StructField("transaction", T.StringType()),
    ]
)

# Per-route column lists (≙ the select lists at
# `Dcache_kafka_to_hive.py:116,123,130,137`), post-flatten names. Order is
# part of the table contract (positional-insert semantics, SURVEY §2.7)
# and is pinned by tests.
ROUTE_COLUMNS: dict[str, list[str]] = {
    "transfers": [
        "date", "msgType", "cellName", "session", "subject", "initiator",
        "transferPath", "queuingTime", "cellDomain", "isP2p", "transferTime",
        "storageInfo", "transferSize", "localEndpoint", "protocolInfo_protocol",
        "protocolInfo_port", "protocolInfo_host", "cellType", "fileSize",
        "pnfsid", "billingPath", "isWrite", "status_msg", "status_code",
    ],
    "requests": [
        "date", "owner", "msgType", "clientChain", "mappedGID", "cellName",
        "session", "subject", "transferPath", "sessionDuration", "storageInfo",
        "cellType", "fileSize", "mappedUID", "queuingTime", "cellDomain",
        "client", "pnfsid", "billingPath", "status_msg", "status_code",
    ],
    "storage": [
        "date", "msgType", "transferTime", "cellName", "session", "storageInfo",
        "cellType", "fileSize", "queuingTime", "cellDomain", "locations",
        "pnfsid", "transaction", "billingPath", "status_msg", "status_code",
    ],
    "removes": [
        "date", "owner", "msgType", "clientChain", "mappedGID", "cellName",
        "session", "subject", "transferPath", "sessionDuration", "cellType",
        "fileSize", "mappedUID", "queuingTime", "cellDomain", "client",
        "pnfsid", "billingPath", "transaction", "status_msg", "status_code",
    ],
}

# Flat (post-flatten) column order produced by parse.parse_billing.
FLAT_COLUMNS: list[str] = [
    f.name for f in BILLING_SCHEMA.fields if f.name not in ("status", "protocolInfo")
] + [
    "status_msg", "status_code",
    "protocolInfo_protocol", "protocolInfo_port", "protocolInfo_host",
]
