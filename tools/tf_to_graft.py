#!/usr/bin/env python3
"""TF1 checkpoint -> graft spec.json + weights.json converter (offline).

Closes the last reference-surface gap (lifeomic/sparkflow
`tensorflow_model_loader.py:8-32` reads a TensorFlow `.meta` +
`latest_checkpoint` pair; graft's `ModelLoader.loadModel` reads its own
spec+weights checkpoint): a sparkflow user migrates a trained dense-net
checkpoint by running this once, then loading the output directory with
`ModelLoader.loadModel(outDir, inputCol)`.

Pure python + numpy — no tensorflow or protobuf install. The reader
implements the PUBLIC TensorFlow "tensor bundle" V2 checkpoint layout
from its format documentation:

- `<prefix>.index` is an SSTable (TensorFlow's table library is a
  LevelDB clone; see leveldb doc/table_format.md): blocks of
  prefix-compressed key/value entries with a restart array, each block
  followed by a 1-byte compression type and a 4-byte masked crc32c; a
  48-byte footer holds varint BlockHandles for the metaindex and index
  blocks plus the table magic 0xdb4775248b80fb57.
- Index values are BundleEntryProto messages
  (tensorflow/core/protobuf/tensor_bundle.proto): dtype(1), shape(2 =
  TensorShapeProto, dims in field 2 with size in field 1), shard_id(3),
  offset(4), size(5), crc32c(6). The "" key is the BundleHeaderProto
  (num_shards in field 1).
- `<prefix>.data-SSSSS-of-NNNNN` shards hold raw little-endian C-order
  tensor bytes at [offset, offset+size).

Protobuf wire decoding is ~30 lines of varint arithmetic (public wire
format), so no generated stubs are needed.

Activation inference: a checkpoint's variables carry shapes but not the
graph's nonlinearities; those live in the `.meta` MetaGraphDef. We walk
its NodeDef ops (again raw wire format: MetaGraphDef.graph_def = field
2, GraphDef.node = field 1, NodeDef.op = field 2) and take, for each
MatMul in graph order, the next activation op (Relu/Sigmoid/Tanh/
Softmax -> graft names; none before the next MatMul -> linear).
--activations overrides when no .meta is present.

Usage:
  python3 tools/tf_to_graft.py <ckpt_prefix> <out_dir>
      [--activations sigmoid,sigmoid] [--loss mse]

<ckpt_prefix> may be the prefix (dir/to_load) or a checkpoint dir
containing a `checkpoint` state file naming the latest prefix.
"""
import json
import os
import struct
import sys

import numpy as np

TABLE_MAGIC = 0xDB4775248B80FB57
DTYPES = {1: "<f4", 2: "<f8", 3: "<i4", 9: "<i8"}
ACT_OPS = {"Relu": "relu", "Sigmoid": "sigmoid", "Tanh": "tanh",
           "Softmax": "softmax"}


# ---- protobuf wire format ----

def read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def proto_fields(buf):
    """Decode one message into {field_number: [values]} — varints as
    ints, length-delimited as bytes, fixed32/64 as raw bytes."""
    out = {}
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = read_varint(buf, pos)
        elif wire == 2:
            n, pos = read_varint(buf, pos)
            v = buf[pos:pos + n]
            pos += n
        elif wire == 5:
            v = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            v = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


# ---- LevelDB-style table (the .index file) ----

def read_block(data, offset, size):
    """Raw block payload; rejects compressed blocks (tensor-bundle index
    blocks are written uncompressed; snappy would need a codec)."""
    ctype = data[offset + size]
    if ctype != 0:
        raise ValueError(f"compressed table block (type {ctype}) unsupported")
    return data[offset:offset + size]


def block_entries(block):
    """Yield (key, value) from one table block, undoing the prefix
    compression via the shared/unshared/value_len entry header."""
    n_restarts = struct.unpack("<I", block[-4:])[0]
    limit = len(block) - 4 * (n_restarts + 1)
    pos = 0
    key = b""
    while pos < limit:
        shared, pos = read_varint(block, pos)
        unshared, pos = read_varint(block, pos)
        vlen, pos = read_varint(block, pos)
        key = key[:shared] + block[pos:pos + unshared]
        pos += unshared
        value = block[pos:pos + vlen]
        pos += vlen
        yield key, value


def table_entries(path):
    """All (key, value) pairs of an SSTable file, in key order."""
    data = open(path, "rb").read()
    footer = data[-48:]
    magic = struct.unpack("<Q", footer[-8:])[0]
    if magic != TABLE_MAGIC:
        raise ValueError(f"{path}: bad table magic {magic:#x}")
    pos = 0
    _, pos = read_varint(footer, pos)       # metaindex offset
    _, pos = read_varint(footer, pos)       # metaindex size
    ioff, pos = read_varint(footer, pos)    # index block offset
    isize, pos = read_varint(footer, pos)   # index block size
    for _, handle in block_entries(read_block(data, ioff, isize)):
        hoff, hpos = read_varint(handle, 0)
        hsize, _ = read_varint(handle, hpos)
        yield from block_entries(read_block(data, hoff, hsize))


# ---- tensor bundle ----

def load_bundle(prefix):
    """{name: np.ndarray} for every tensor in a V2 checkpoint."""
    tensors = {}
    num_shards = 1
    entries = []
    for key, value in table_entries(prefix + ".index"):
        f = proto_fields(value)
        if key == b"":
            num_shards = f.get(1, [1])[0]
            continue
        dtype = f.get(1, [1])[0]
        dims = []
        for shape_msg in f.get(2, [b""]):
            for dim_msg in proto_fields(shape_msg).get(2, []):
                dims.append(proto_fields(dim_msg).get(1, [1])[0])
        shard = f.get(3, [0])[0]
        offset = f.get(4, [0])[0]
        size = f.get(5, [0])[0]
        entries.append((key.decode("utf-8"), dtype, dims, shard, offset, size))
    shards = {}
    for name, dtype, dims, shard, offset, size in entries:
        if shard not in shards:
            shards[shard] = open(
                f"{prefix}.data-{shard:05d}-of-{num_shards:05d}", "rb").read()
        raw = shards[shard][offset:offset + size]
        if dtype not in DTYPES:
            raise ValueError(f"{name}: unsupported dtype {dtype}")
        arr = np.frombuffer(raw, dtype=DTYPES[dtype])
        tensors[name] = arr.reshape(dims) if dims else arr.reshape(())
    return tensors


def graph_ops(meta_path):
    """NodeDef (name, op) pairs in graph order from a .meta
    MetaGraphDef, or [] when absent/unparsable."""
    if not os.path.isfile(meta_path):
        return []
    try:
        meta = proto_fields(open(meta_path, "rb").read())
        ops = []
        for graph_def in meta.get(2, []):
            for node in proto_fields(graph_def).get(1, []):
                nf = proto_fields(node)
                name = nf.get(1, [b""])[0].decode("utf-8", "replace")
                op = nf.get(2, [b""])[0].decode("utf-8", "replace")
                ops.append((name, op))
        return ops
    except Exception as e:  # inference is best-effort; shapes still convert
        print(f"[tf_to_graft] .meta parse failed ({e}); "
              "pass --activations explicitly", file=sys.stderr)
        return []


def infer_activations(ops, n_layers):
    """Per-MatMul NEXT (first) following activation op, graph order;
    linear when a MatMul reaches the next MatMul (or the end) without
    one. First-wins: a segment with two ACT_OPS nodes (e.g. a Tanh layer
    whose logits also feed a terminal Softmax for the loss) labels the
    layer with the op that actually transforms its output — the first —
    not the loss-side one. Only the FORWARD graph counts — backprop
    mirrors every MatMul under the `gradients/` name scope
    (tf.gradients' fixed prefix), which would otherwise double the
    layer count."""
    acts = []
    current = None
    for name, op in ops:
        if name.startswith("gradients/") or "/gradients/" in name:
            continue
        if op in ("MatMul", "BatchMatMul", "BatchMatMulV2"):
            if current is not None:
                acts.append(current)
            current = "linear"
        elif current == "linear" and op in ACT_OPS:
            current = ACT_OPS[op]
    if current is not None:
        acts.append(current)
    return acts if len(acts) == n_layers else []


def resolve_prefix(path):
    """Accept a bundle prefix or a directory with a `checkpoint` state
    file (whose first line is model_checkpoint_path: "<prefix>")."""
    if os.path.isfile(path + ".index"):
        return path
    state = os.path.join(path, "checkpoint")
    if os.path.isdir(path) and os.path.isfile(state):
        for line in open(state):
            if line.startswith("model_checkpoint_path:"):
                rel = line.split(":", 1)[1].strip().strip('"')
                cand = rel if os.path.isabs(rel) else os.path.join(path, rel)
                if os.path.isfile(cand + ".index"):
                    return cand
    raise FileNotFoundError(f"no .index bundle at or under {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    prefix = resolve_prefix(args[0])
    out_dir = args[1]
    tensors = load_bundle(prefix)

    # dense-net layer recovery: kernels are the rank-2 floats, biases
    # rank-1; order by graph appearance of the variable when .meta is
    # readable, else by name. Optimizer slot variables (Adam moments
    # etc.) shadow their parent kernels at rank 2 — drop anything whose
    # name continues past the parent with a slot suffix.
    names = list(tensors)
    slotless = [n for n in names
                if not any(n != p and n.startswith(p + "/") for p in names)]
    ops = graph_ops(prefix + ".meta")
    order = {name: i for i, (name, _) in enumerate(ops)}
    slotless.sort(key=lambda n: (order.get(n, len(order)), n))
    kernels = [n for n in slotless if tensors[n].ndim == 2]
    biases = [n for n in slotless if tensors[n].ndim == 1]
    if not kernels or len(kernels) != len(biases):
        sys.exit(f"not a dense-net checkpoint: {len(kernels)} rank-2 / "
                 f"{len(biases)} rank-1 variables after slot filtering")
    # chain check: kernel i is [in_i, out_i]; out_i == in_{i+1} == |b_i|
    for i, (k, b) in enumerate(zip(kernels, biases)):
        if tensors[k].shape[1] != tensors[b].shape[0]:
            sys.exit(f"kernel {k} {tensors[k].shape} does not pair with "
                     f"bias {b} {tensors[b].shape}")
        if i and tensors[kernels[i - 1]].shape[1] != tensors[k].shape[0]:
            sys.exit(f"layer chain broken at {k}: fan-in "
                     f"{tensors[k].shape[0]} != previous fan-out "
                     f"{tensors[kernels[i - 1]].shape[1]}")

    if "activations" in opts:
        acts = opts["activations"].split(",")
    else:
        acts = infer_activations(ops, len(kernels))
        if not acts:
            sys.exit("could not infer activations from .meta — pass "
                     "--activations=a1,a2,... (one per layer)")
    if len(acts) != len(kernels):
        sys.exit(f"{len(acts)} activations for {len(kernels)} layers")
    loss = opts.get("loss", "softmax_xent" if acts[-1] == "softmax" else "mse")

    layers = [{"in": int(tensors[k].shape[0]), "out": int(tensors[k].shape[1]),
               "activation": a, "dropout": 0.0, "kind": "dense"}
              for k, a in zip(kernels, acts)]
    spec = {"layers": layers, "loss": loss, "seed": 42}
    weights = []
    for k, b in zip(kernels, biases):
        weights.append(np.asarray(tensors[k], dtype=np.float64).tolist())
        weights.append([np.asarray(tensors[b], dtype=np.float64).tolist()])

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "spec.json"), "w") as f:
        json.dump(spec, f)
    with open(os.path.join(out_dir, "weights.json"), "w") as f:
        json.dump(weights, f)
    dims = " -> ".join([str(layers[0]["in"])] + [str(l["out"]) for l in layers])
    print(f"converted {prefix}: {dims}, activations {','.join(acts)}, "
          f"loss {loss} -> {out_dir}")


if __name__ == "__main__":
    main()
