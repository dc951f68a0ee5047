"""Minimal MMDB writer — test infrastructure.

Builds a spec-conformant MaxMind DB file (search tree + data section +
metadata) from a list of (CIDR, record) pairs.  Used to synthesize
fixture databases (e.g. a Spur anonymity feed, which has no public test
file) and to property-test the decoder round-trip.  Implements the
public format spec only; 32-bit records, no pointer compression (the
spec makes pointers optional for writers).

IPv4 networks are stored under the v4-mapped ::ffff:0:0/96 prefix,
matching the engine's lookup convention.
"""

from __future__ import annotations

import ipaddress
import struct
import time
from pathlib import Path

_RECORD_SIZE = 32  # bits


def _encode(value) -> bytes:
    """Encode one data-section value (no pointers)."""
    if isinstance(value, bool):
        # extended type 14: control 0x00|size, ext byte 14-7
        return bytes([(0 << 5) | (1 if value else 0), 14 - 7])
    if isinstance(value, str):
        b = value.encode("utf-8")
        return _ctrl(2, len(b)) + b
    if isinstance(value, float):
        return _ctrl(3, 8) + struct.pack(">d", value)
    if isinstance(value, bytes):
        return _ctrl(4, len(value)) + value
    if isinstance(value, int):
        if value < 0:
            b = value.to_bytes(4, "big", signed=True)
            return bytes([(0 << 5) | 4, 8 - 7]) + b
        if value < 1 << 16:
            b = value.to_bytes((value.bit_length() + 7) // 8, "big") if value else b""
            return _ctrl(5, len(b)) + b
        if value < 1 << 32:
            b = value.to_bytes((value.bit_length() + 7) // 8, "big")
            return _ctrl(6, len(b)) + b
        b = value.to_bytes((value.bit_length() + 7) // 8, "big")
        return bytes([(0 << 5) | len(b), 9 - 7]) + b
    if isinstance(value, dict):
        out = _ctrl(7, len(value))
        for k, v in value.items():
            out += _encode(str(k)) + _encode(v)
        return out
    if isinstance(value, (list, tuple)):
        out = bytes([(0 << 5) | len(value), 11 - 7]) if len(value) < 29 else None
        if out is None:
            raise ValueError("array too long for minimal writer")
        for v in value:
            out += _encode(v)
        return out
    raise TypeError(f"unsupported type {type(value)}")


def _ctrl(typ: int, size: int) -> bytes:
    if size < 29:
        return bytes([(typ << 5) | size])
    if size < 29 + 256:
        return bytes([(typ << 5) | 29, size - 29])
    if size < 285 + 65536:
        return bytes([(typ << 5) | 30]) + (size - 285).to_bytes(2, "big")
    return bytes([(typ << 5) | 31]) + (size - 65821).to_bytes(3, "big")


class _Node:
    __slots__ = ("left", "right", "data", "num")

    def __init__(self):
        self.left = None
        self.right = None
        self.data = None
        self.num = -1


def _net_bits(net) -> tuple[int, int]:
    """(128-bit value, prefix length) in the v4-mapped address space."""
    if net.version == 4:
        return (0xFFFF << 32) | int(net.network_address), 96 + net.prefixlen
    return int(net.network_address), net.prefixlen


def write_mmdb(
    path: str | Path,
    entries: list[tuple[str, dict]],
    database_type: str = "Test-DB",
) -> None:
    root = _Node()
    data_blobs: list[bytes] = []
    offsets: dict[bytes, int] = {}

    def data_offset(record: dict) -> int:
        blob = _encode(record)
        if blob in offsets:
            return offsets[blob]
        off = sum(len(b) for b in data_blobs)
        offsets[blob] = off
        data_blobs.append(blob)
        return off

    for cidr, record in entries:
        net = ipaddress.ip_network(cidr, strict=False)
        val, plen = _net_bits(net)
        node = root
        for depth in range(plen):
            bit = (val >> (127 - depth)) & 1
            child = node.right if bit else node.left
            if child is None:
                child = _Node()
                if bit:
                    node.right = child
                else:
                    node.left = child
            node = child
            if node.data is not None:
                raise ValueError(f"network {cidr} nested under an existing entry")
        if node.left or node.right:
            raise ValueError(f"network {cidr} contains an existing entry")
        node.data = data_offset(record)

    # number internal nodes (nodes with any child); leaves carry data
    internal: list[_Node] = []

    def collect(n: _Node):
        if n.left or n.right or n is root:
            n.num = len(internal)
            internal.append(n)
            for c in (n.left, n.right):
                if c is not None:
                    collect(c)

    collect(root)
    node_count = len(internal)

    def record_value(child: _Node | None) -> int:
        if child is None:
            return node_count  # no data
        if child.num >= 0:
            return child.num
        return node_count + 16 + child.data

    tree = bytearray()
    for n in internal:
        tree += record_value(n.left).to_bytes(4, "big")
        tree += record_value(n.right).to_bytes(4, "big")

    data_section = b"".join(data_blobs)
    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": int(time.time()),
        "database_type": database_type,
        "description": {"en": f"synthetic {database_type}"},
        "ip_version": 6,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": _RECORD_SIZE,
    }
    blob = (
        bytes(tree)
        + b"\x00" * 16
        + data_section
        + b"\xab\xcd\xefMaxMind.com"
        + _encode(meta)
    )
    Path(path).write_bytes(blob)
