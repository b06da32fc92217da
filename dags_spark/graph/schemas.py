"""Declarative YAML schemas for the graph layer.

The reference system declared node schemas as YAML documents — field
name/type/nullable plus ``unique_on`` (the key the incremental dedupe
collapses on) and an implements/inherits relation between schemas.
This loader maps those documents onto the engine's existing
primitives: ``StructType`` (via DDL), ``NodeSpec`` metadata, and
``schema_implements`` for the relation — no new type system, just a
declarative front door.

Document shape (one YAML doc per schema; multi-doc streams allowed)::

    name: user_events
    inherits: base_events          # optional: merge parent fields
    implements: event_iface        # optional: must widen-satisfy it
    unique_on: [user_id, event_type]
    order_by: [ts]                 # recency for unique_on dedupe
    fields:
      - {name: event_id, type: bigint, nullable: false}
      - {name: ts, type: timestamp}

``inherits`` copies the parent's fields first (child re-declarations
override positionally in place), and is transitive. ``implements``
does NOT copy anything — it is checked: the resolved field set must
widen-satisfy the target schema (schema_implements semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.types import StructField, StructType

from .core import GraphError, schema_implements


@dataclass(frozen=True)
class SchemaDoc:
    name: str
    struct: StructType
    unique_on: tuple[str, ...] = ()
    order_by: tuple[str, ...] = ()
    implements: str | None = None
    inherits: str | None = None

    @property
    def ddl(self) -> str:
        return ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            + ("" if f.nullable else " NOT NULL")
            for f in self.struct.fields
        )

    def node_kwargs(self) -> dict:
        """Keyword arguments for ``Graph.node`` / ``NodeSpec``."""
        return {
            "schema": self.ddl,
            "unique_on": self.unique_on,
            "order_by": self.order_by,
        }


# Session-free type parser: Spark's own DDL parser
# (StructType.fromDDL / _parse_datatype_string) requires an active
# SparkSession, but schema documents must be loadable/validatable
# before any session exists (e.g. CI linting a schema directory).
# Grammar: primitives | decimal(p,s) | array<T> | map<K,V> |
# struct<name:T, ...> — the simpleString form round-trips.

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "byte": T.ByteType(), "tinyint": T.ByteType(),
    "short": T.ShortType(), "smallint": T.ShortType(),
    "int": T.IntegerType(), "integer": T.IntegerType(),
    "long": T.LongType(), "bigint": T.LongType(),
    "float": T.FloatType(), "real": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def parse_type(s: str) -> T.DataType:
    """Parse a simpleString-style type without a SparkSession.

    Type KEYWORDS are case-insensitive (like Spark DDL) but struct
    field names keep their declared case — lowercasing the whole
    string would silently case-fold nested column names.
    """
    s = s.strip()
    low = s.lower()
    if low in _PRIMITIVES:
        return _PRIMITIVES[low]
    if low.startswith("decimal"):
        inner = s[len("decimal"):].strip()
        if not inner:
            return T.DecimalType(10, 0)
        if inner.startswith("(") and inner.endswith(")"):
            try:
                parts = [int(x) for x in inner[1:-1].split(",")]
            except ValueError as e:
                raise GraphError(f"invalid type: {s!r}") from e
            if len(parts) == 1:  # decimal(p) — scale defaults to 0
                return T.DecimalType(parts[0], 0)
            if len(parts) == 2:
                return T.DecimalType(parts[0], parts[1])
            raise GraphError(f"invalid type: {s!r}")
    if low.startswith("array<") and low.endswith(">"):
        return T.ArrayType(parse_type(s[6:-1]))
    if low.startswith("map<") and low.endswith(">"):
        k, v = _split_top(s[4:-1])
        return T.MapType(parse_type(k), parse_type(v))
    if low.startswith("struct<") and low.endswith(">"):
        fields = []
        for part in _split_top(s[7:-1]):
            nm, tp = part.split(":", 1)
            fields.append(T.StructField(nm.strip(), parse_type(tp)))
        return T.StructType(fields)
    raise GraphError(f"invalid type: {s!r}")


def _parse_fields(raw: list, doc_name: str) -> list[StructField]:
    fields: list[StructField] = []
    for i, f in enumerate(raw):
        if not isinstance(f, dict) or "name" not in f or "type" not in f:
            raise GraphError(
                f"schema {doc_name!r}: field #{i} needs 'name' and 'type'"
            )
        try:
            dtype = parse_type(str(f["type"]))
        except GraphError as e:
            raise GraphError(
                f"schema {doc_name!r}: field {f['name']!r} has invalid "
                f"type {f['type']!r}: {e}"
            ) from e
        fields.append(StructField(f["name"], dtype, bool(f.get("nullable", True))))
    return fields


def load_schemas(text: str) -> dict[str, SchemaDoc]:
    """Parse a (multi-document) YAML stream into resolved SchemaDocs.

    Resolution order is dependency-driven: ``inherits`` parents must
    be defined in the same stream; cycles and unknown parents raise.
    ``implements`` targets are validated with schema_implements after
    all docs resolve.
    """
    import yaml

    raw_docs = [d for d in yaml.safe_load_all(text) if d is not None]
    by_name: dict[str, dict] = {}
    for d in raw_docs:
        if not isinstance(d, dict) or "name" not in d or "fields" not in d:
            raise GraphError("every schema document needs 'name' and 'fields'")
        if d["name"] in by_name:
            raise GraphError(f"duplicate schema document: {d['name']!r}")
        by_name[d["name"]] = d

    resolved: dict[str, SchemaDoc] = {}

    def resolve(name: str, chain: tuple[str, ...] = ()) -> SchemaDoc:
        if name in resolved:
            return resolved[name]
        if name in chain:
            raise GraphError(f"inherits cycle: {' -> '.join(chain + (name,))}")
        d = by_name.get(name)
        if d is None:
            raise GraphError(f"unknown schema referenced by inherits: {name!r}")
        own = _parse_fields(d["fields"], name)
        if d.get("inherits"):
            parent = resolve(d["inherits"], chain + (name,))
            merged = list(parent.struct.fields)
            idx = {f.name: i for i, f in enumerate(merged)}
            for f in own:
                if f.name in idx:
                    merged[idx[f.name]] = f  # child override, position kept
                else:
                    merged.append(f)
            own = merged
        doc = SchemaDoc(
            name=name,
            struct=StructType(own),
            unique_on=tuple(d.get("unique_on", ())),
            order_by=tuple(d.get("order_by", ())),
            implements=d.get("implements"),
            inherits=d.get("inherits"),
        )
        missing = [c for c in doc.unique_on + doc.order_by
                   if c not in {f.name for f in doc.struct.fields}]
        if missing:
            raise GraphError(
                f"schema {name!r}: unique_on/order_by columns not in "
                f"fields: {missing}"
            )
        resolved[name] = doc
        return doc

    for name in by_name:
        resolve(name)

    # validate the implements relation across the resolved set
    for doc in resolved.values():
        if doc.implements:
            target = resolved.get(doc.implements)
            if target is None:
                raise GraphError(
                    f"schema {doc.name!r} implements unknown schema "
                    f"{doc.implements!r}"
                )
            problems = schema_implements(doc.struct, target.struct)
            if problems:
                raise GraphError(
                    f"schema {doc.name!r} does not implement "
                    f"{doc.implements!r}: {problems}"
                )
    return resolved


def load_schema_file(path: str) -> dict[str, SchemaDoc]:
    with open(path) as fh:
        return load_schemas(fh.read())
