#!/usr/bin/env python3
"""Regenerate the committed TF-checkpoint golden fixture
(src/test/resources/tf_checkpoint/) that ModelLoaderTfSpec converts with
tools/tf_to_graft.py.

Writes a minimal-but-valid TensorFlow V2 "tensor bundle" (the same
public SSTable + BundleEntryProto layout tf_to_graft.py reads — see its
docstring for format references) holding a deterministic 2 -> 3 sigmoid
-> 1 linear dense net, plus a `.meta` MetaGraphDef carrying just the
NodeDef (name, op) sequence the activation inference walks (including
`gradients/` decoy MatMuls that must be skipped), plus the `checkpoint`
state file. Weight values are multiples of 1/64 so the float32 storage
is exact and the Scala spec can assert bit-equal forward passes.

Usage: python3 tools/make_tf_fixture.py [out_dir]
"""
import os
import struct
import sys

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/tf_checkpoint"
TABLE_MAGIC = 0xDB4775248B80FB57


def varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def field(num, wire, payload):
    tag = varint(num << 3 | wire)
    if wire == 0:
        return tag + varint(payload)
    if wire == 2:
        return tag + varint(len(payload)) + payload
    raise ValueError(wire)


def shape_proto(dims):
    return b"".join(field(2, 2, field(1, 0, d)) for d in dims)


def bundle_entry(dtype, dims, shard, offset, size):
    return (field(1, 0, dtype) + field(2, 2, shape_proto(dims)) +
            field(3, 0, shard) + field(4, 0, offset) + field(5, 0, size))


def block(entries):
    """One table block: entries (key-sorted, no prefix sharing, a
    restart point per entry) + restart array + trailer-less payload."""
    body = bytearray()
    restarts = []
    for key, value in entries:
        restarts.append(len(body))
        body += varint(0) + varint(len(key)) + varint(len(value))
        body += key + value
    for r in restarts:
        body += struct.pack("<I", r)
    body += struct.pack("<I", len(restarts))
    return bytes(body)


def write_table(path, entries):
    """SSTable: data block, (empty) metaindex block, index block,
    footer. Block trailers carry type 0 + zero crc (the converter does
    not verify crcs; real TF would — this fixture feeds our tool)."""
    out = bytearray()

    def append_block(payload):
        off = len(out)
        out.extend(payload)
        out.append(0)                       # compression type: none
        out.extend(struct.pack("<I", 0))    # crc placeholder
        return off, len(payload)

    doff, dsize = append_block(block(entries))
    moff, msize = append_block(block([]))
    index = block([(entries[-1][0] + b"\x00",
                    varint(doff) + varint(dsize))])
    ioff, isize = append_block(index)
    footer = varint(moff) + varint(msize) + varint(ioff) + varint(isize)
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", TABLE_MAGIC)
    out.extend(footer)
    open(path, "wb").write(bytes(out))


def node(name, op):
    return field(1, 2, field(1, 2, name.encode()) + field(2, 2, op.encode()))


def main():
    os.makedirs(OUT, exist_ok=True)
    # exact-in-float32 weights: k/64
    w1 = np.array([[8, -16, 24], [4, 12, -20]], dtype=np.float32) / 64
    b1 = np.array([2, -6, 10], dtype=np.float32) / 64
    w2 = np.array([[32], [-24], [16]], dtype=np.float32) / 64
    b2 = np.array([-4], dtype=np.float32) / 64

    tensors = [("dense/bias", b1), ("dense/kernel", w1),
               ("out/bias", b2), ("out/kernel", w2)]
    # decoy optimizer slots — the converter must drop them
    tensors += [("dense/kernel/Adam", np.zeros_like(w1)),
                ("out/bias/Adam", np.zeros_like(b2))]
    tensors.sort(key=lambda kv: kv[0])

    data = bytearray()
    entries = [(b"", field(1, 0, 1))]  # BundleHeaderProto num_shards=1
    for name, arr in tensors:
        raw = arr.astype("<f4").tobytes()
        entries.append((name.encode(),
                        bundle_entry(1, list(arr.shape), 0, len(data), len(raw))))
        data += raw
    write_table(os.path.join(OUT, "to_load.index"), entries)
    open(os.path.join(OUT, "to_load.data-00000-of-00001"), "wb").write(bytes(data))

    nodes = [node("x", "Placeholder"),
             node("dense/kernel", "VariableV2"),
             node("dense/bias", "VariableV2"),
             node("dense/MatMul", "MatMul"),
             node("dense/BiasAdd", "BiasAdd"),
             node("dense/Sigmoid", "Sigmoid"),
             node("out/kernel", "VariableV2"),
             node("out/bias", "VariableV2"),
             node("out/MatMul", "MatMul"),
             node("out/BiasAdd", "BiasAdd"),
             # backprop decoys: must not become layers/activations
             node("gradients/out/MatMul_grad/MatMul", "MatMul"),
             node("gradients/dense/MatMul_grad/MatMul", "MatMul"),
             node("gradients/dense/Sigmoid_grad/SigmoidGrad", "SigmoidGrad")]
    meta = field(2, 2, b"".join(nodes))  # MetaGraphDef.graph_def
    open(os.path.join(OUT, "to_load.meta"), "wb").write(meta)
    open(os.path.join(OUT, "checkpoint"), "w").write(
        'model_checkpoint_path: "to_load"\n'
        'all_model_checkpoint_paths: "to_load"\n')
    print(f"fixture written to {OUT}")


if __name__ == "__main__":
    main()
