"""Map/Atlas snapshots: save + load + integrity hash.

TPU-native replacement for the reference's boost-serialization atlas archive
(reference semantics: System::SaveAtlas/LoadAtlas src/System.cc:1408-1511 —
binary archive of all maps/keyframes/landmarks + static id counters + an MD5
checksum of the vocabulary so a snapshot is only loaded against the
vocabulary it was built with; PreSave/PostLoad pointer fixups in
src/Map.cc:359-427).

Re-design: the map already IS flat arrays (slam_map.map_state), so a snapshot
is a single compressed .npz — no PreSave/PostLoad graph surgery. The
vocabulary checksum is sha256 over the vocabulary node array.
"""

from __future__ import annotations

import hashlib
import json
from typing import Optional

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc_mod

FORMAT_VERSION = 1


def vocab_checksum(vocab) -> str:
    h = hashlib.sha256()
    h.update(np.asarray(vocab.nodes).tobytes())
    h.update(np.asarray(vocab.weights).tobytes())
    return h.hexdigest()


def save_map(path: str, state: ms.MapState, cfg: ms.MapConfig,
             n_kf: int, n_lm: int, vocab=None, extra: Optional[dict] = None):
    arrays = {f"map_{k}": np.asarray(v) for k, v in state._asdict().items()}
    meta = {
        "format_version": FORMAT_VERSION,
        "config": list(cfg),
        "n_kf": int(n_kf),
        "n_lm": int(n_lm),
        "vocab_checksum": vocab_checksum(vocab) if vocab is not None else "",
        "extra": extra or {},
    }
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    if vocab is not None:
        arrays["vocab_nodes"] = np.asarray(vocab.nodes)
        arrays["vocab_weights"] = np.asarray(vocab.weights)
        arrays["vocab_shape"] = np.array([vocab.branching, vocab.depth])
    np.savez_compressed(path, **arrays)


class SnapshotError(RuntimeError):
    pass


def save_atlas(path: str, state: ms.MapState, cfg: ms.MapConfig,
               n_kf: int, n_lm: int, kf_order, stored=(),
               hists=None, vocab=None, extra: Optional[dict] = None):
    """Serialize the WHOLE Atlas: active map + every stored map + their BoW
    histogram databases + counters (reference: System::SaveAtlas
    src/System.cc:1408-1446 archives all maps, cameras and static id
    counters; the round-1 snapshot dropped stored maps and the BoW DB).

    stored: iterable of slam_map.atlas.StoredMap.
    hists: (K, W) active-map BoW histograms (None if no vocabulary).
    """
    arrays = {f"act_{k}": np.asarray(v) for k, v in state._asdict().items()}
    if hists is not None:
        arrays["act_hists"] = np.asarray(hists)
    stored_meta = []
    for i, sm in enumerate(stored):
        for k, v in sm.state._asdict().items():
            arrays[f"st{i}_{k}"] = np.asarray(v)
        arrays[f"st{i}_hists"] = np.asarray(sm.hists)
        stored_meta.append({"n_kf": int(sm.n_kf), "n_lm": int(sm.n_lm)})
    meta = {
        "format_version": 2,
        "config": list(cfg),
        "n_kf": int(n_kf),
        "n_lm": int(n_lm),
        "kf_order": [int(k) for k in kf_order],
        "stored": stored_meta,
        "vocab_checksum": vocab_checksum(vocab) if vocab is not None else "",
        "extra": extra or {},
    }
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(),
                                        dtype=np.uint8)
    if vocab is not None:
        arrays["vocab_nodes"] = np.asarray(vocab.nodes)
        arrays["vocab_weights"] = np.asarray(vocab.weights)
        arrays["vocab_shape"] = np.array([vocab.branching, vocab.depth])
    np.savez_compressed(path, **arrays)


def load_atlas(path: str, vocab=None):
    """Load a full-Atlas snapshot. Returns
    (state, cfg, meta, hists_or_None, stored_list, vocab_or_None) where
    stored_list entries are (state, n_kf, n_lm, hists) tuples matching
    slam_map.atlas.StoredMap (reference: LoadAtlas + PostLoad,
    src/System.cc:1450-1511)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta_json"]).decode())
    if meta["format_version"] != 2:
        raise SnapshotError(
            f"atlas snapshot format {meta['format_version']} != 2")
    if vocab is not None and meta["vocab_checksum"]:
        if vocab_checksum(vocab) != meta["vocab_checksum"]:
            raise SnapshotError(
                "vocabulary checksum mismatch — snapshot was built with a "
                "different vocabulary (reference behavior: refuse to load)")
    cfg = ms.MapConfig(*meta["config"])

    def read_state(prefix):
        fields = {k: jnp.asarray(z[f"{prefix}_{k}"])
                  for k in ms.MapState._fields}
        return ms.MapState(**fields)

    state = read_state("act")
    hists = np.asarray(z["act_hists"]) if "act_hists" in z else None
    stored = []
    for i, sm in enumerate(meta["stored"]):
        stored.append((read_state(f"st{i}"), sm["n_kf"], sm["n_lm"],
                       np.asarray(z[f"st{i}_hists"])))
    loaded_vocab = None
    if "vocab_nodes" in z:
        b, d = (int(x) for x in z["vocab_shape"])
        loaded_vocab = voc_mod.Vocabulary(
            jnp.asarray(z["vocab_nodes"]), jnp.asarray(z["vocab_weights"]),
            b, d)
    return state, cfg, meta, hists, stored, loaded_vocab


def load_map(path: str, vocab=None):
    """Returns (state, cfg, n_kf, n_lm, vocab_or_None, extra).

    If `vocab` is given, its checksum must match the snapshot's (the
    reference aborts on MD5 mismatch, src/System.cc:1495-1502); if the
    snapshot embeds a vocabulary it is returned."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta_json"]).decode())
    if meta["format_version"] != FORMAT_VERSION:
        raise SnapshotError(f"snapshot format {meta['format_version']} != {FORMAT_VERSION}")
    cfg = ms.MapConfig(*meta["config"])
    fields = {}
    for k in ms.MapState._fields:
        fields[k] = jnp.asarray(z[f"map_{k}"])
    state = ms.MapState(**fields)
    loaded_vocab = None
    if "vocab_nodes" in z:
        b, d = (int(x) for x in z["vocab_shape"])
        loaded_vocab = voc_mod.Vocabulary(
            jnp.asarray(z["vocab_nodes"]), jnp.asarray(z["vocab_weights"]), b, d
        )
    if vocab is not None and meta["vocab_checksum"]:
        if vocab_checksum(vocab) != meta["vocab_checksum"]:
            raise SnapshotError(
                "vocabulary checksum mismatch — snapshot was built with a "
                "different vocabulary (reference behavior: refuse to load)"
            )
    return state, cfg, meta["n_kf"], meta["n_lm"], loaded_vocab, meta["extra"]
