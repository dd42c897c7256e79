"""Conformance: the wire-protocol implementation matches docs/PROTOCOL.md.

docs/PROTOCOL.md is the normative spec for the serve wire format (the
reference has no network surface; see SURVEY.md §2.9). This test parses
every ```conformance``` block in the doc — lines of the form
`<python expr> => <hex bytes>` — and checks the Python implementation
(cough_detector_tpu/serve/protocol.py) produces exactly those bytes,
then pins the round-trip invariants the doc's §9 lists. The C++ plane
(native/cdt_ingest.cpp) is held byte-compatible by the cross-backend
parity tests in tests/test_serve.py.
"""

import re
import socket
from pathlib import Path

import numpy as np
import pytest

from cough_detector_tpu.serve import protocol

DOC = Path(__file__).resolve().parent.parent / "docs" / "PROTOCOL.md"


def _examples():
    text = DOC.read_text()
    blocks = re.findall(r"```conformance\n(.*?)```", text, re.S)
    assert blocks, "PROTOCOL.md lost its conformance block"
    out = []
    for block in blocks:
        for line in block.strip().splitlines():
            expr, _, hexpart = line.partition("=>")
            out.append((expr.strip(), hexpart.replace(" ", "").strip()))
    assert len(out) >= 8
    return out


class TestDocExamples:
    @pytest.mark.parametrize("expr,hexbytes", _examples())
    def test_encode_matches_doc(self, expr, hexbytes):
        got = eval(expr, {"protocol": protocol, "np": np})  # noqa: S307
        assert isinstance(got, bytes)
        assert got.hex() == hexbytes, f"{expr} produced {got.hex()}"

    @pytest.mark.parametrize("expr,hexbytes", _examples())
    def test_read_frame_round_trip(self, expr, hexbytes):
        raw = bytes.fromhex(hexbytes)
        a, b = socket.socketpair()
        try:
            a.sendall(raw)
            a.shutdown(socket.SHUT_WR)
            frame = protocol.read_frame(b)
            assert frame is not None
            assert protocol.encode(frame.type, frame.stream, frame.payload) == raw
            assert protocol.read_frame(b) is None  # clean EOF after one frame
        finally:
            a.close()
            b.close()


class TestRoundTripInvariants:
    def test_open_threshold_inverts(self):
        frame = protocol.Frame(protocol.OPEN, 0, protocol.encode_open(0.5)[12:])
        assert protocol.decode_open_threshold(frame) == 0.5
        empty = protocol.Frame(protocol.OPEN, 0, b"")
        assert protocol.decode_open_threshold(empty) is None

    def test_thresh_inverts(self):
        frame = protocol.Frame(protocol.THRESH, 3, protocol.encode_thresh(3, 0.25)[12:])
        assert protocol.decode_thresh(frame) == 0.25

    def test_event_inverts(self):
        frame = protocol.Frame(protocol.EVENT, 3, protocol.encode_event(3, 1.5, 0.875)[12:])
        assert protocol.decode_event(frame) == {"time": 1.5, "confidence": 0.875}

    @pytest.mark.parametrize("payload", [b"\x00" * 3, b"\x00" * 5])
    def test_bad_sizes_raise(self, payload):
        with pytest.raises(ValueError):
            protocol.decode_open_threshold(protocol.Frame(protocol.OPEN, 0, payload))
        with pytest.raises(ValueError):
            protocol.decode_thresh(protocol.Frame(protocol.THRESH, 0, payload))

    @pytest.mark.parametrize("bad", [float("nan"), float("inf"), float("-inf")])
    def test_non_finite_raise(self, bad):
        import struct

        payload = struct.pack("<f", bad)
        with pytest.raises(ValueError):
            protocol.decode_open_threshold(protocol.Frame(protocol.OPEN, 0, payload))
        with pytest.raises(ValueError):
            protocol.decode_thresh(protocol.Frame(protocol.THRESH, 0, payload))

    def test_oversized_length_drops_connection(self):
        import struct

        head = struct.pack(
            "<HBBII", protocol.MAGIC, protocol.AUDIO, 0, 0, protocol.MAX_PAYLOAD + 1
        )
        a, b = socket.socketpair()
        try:
            a.sendall(head)
            with pytest.raises(ConnectionError):
                protocol.read_frame(b)
        finally:
            a.close()
            b.close()
