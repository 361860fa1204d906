"""Test harness configuration.

All tests run on the CPU backend with 8 virtual devices
(xla_force_host_platform_device_count) — the standard JAX way to exercise
pjit/shard_map/collectives without a pod (SURVEY.md §4).  These env vars must
be set before `import jax`, hence this file sets them at import time.

Corpus decode + oracle fingerprints are disk-cached under tests/_cache so
repeated runs are fast.
"""

import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
existing_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in existing_flags:
    os.environ["XLA_FLAGS"] = (
        existing_flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax (TPU plugin registration) before
# this conftest runs, so the env var above may be captured too late -- force
# the platform through the live config object as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

CORPUS = pathlib.Path("/root/reference/LBAudioDetectiveTests/Birds")
CACHE = REPO_ROOT / "tests" / "_cache"
CACHE.mkdir(exist_ok=True)

# Persistent XLA compilation cache: repeated test runs skip recompilation.
# The dir is keyed by a host-CPU-feature fingerprint: XLA's cache key does
# NOT include machine features, and loading a CPU AOT executable compiled on
# a host with different features (these VMs migrate between machine types
# across sessions) segfaults inside cpu_aot_loader.  A new machine type gets
# a cold cache instead of a crash.  (The TPU scripts keep tests/_cache/xla —
# their executables are TPU, never routed through the CPU AOT loader.)


def _host_cpu_tag() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


if not os.environ.get("LBAD_NO_XLA_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      str(CACHE / f"xla_cpu_{_host_cpu_tag()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BIRDS = ["BlackBird", "BlueTit", "Chaffinch", "Sparrow", "GreatTit",
         "Crow", "Wren", "Chiffchaff", "Kestrel", "Pigeon"]
SUFFIX_DIRS = {"_eql": "Cropped/Equal", "_dif": "Cropped/Different",
               "_blu1": "Cropped/Blurred", "_blu2": "Cropped/Blurred",
               "_rec": "Cropped/Recorded"}


def corpus_path(name: str) -> str:
    """Resolve a corpus clip name like 'BlackBird' or 'Wren_blu1' to a path."""
    for suffix, sub in SUFFIX_DIRS.items():
        if name.endswith(suffix):
            return str(CORPUS / sub / f"{name}.caf")
    return str(CORPUS / "Archive" / f"{name}.caf")


class _LazyDict:
    """Dict-like that computes and disk-caches entries on first access."""

    def __init__(self, loader):
        self._loader = loader
        self._data = {}

    def __getitem__(self, name):
        if name not in self._data:
            self._data[name] = self._loader(name)
        return self._data[name]

    def keys(self):
        names = list(BIRDS)
        for suffix in SUFFIX_DIRS:
            names += [b + suffix for b in BIRDS]
        return names

    def items(self):
        return ((n, self[n]) for n in self.keys())


def _io_code_hash() -> str:
    """Hash of the decode/resample sources (keys the decoded_* cache)."""
    import hashlib

    io_dir = REPO_ROOT / "lbaudiodetective_tpu" / "io"
    h = hashlib.sha256()
    for f in sorted(list(io_dir.glob("*.py")) + list(io_dir.glob("native/*.cpp"))):
        h.update(f.name.encode())
        h.update(f.read_bytes())
    return h.hexdigest()[:8]


@pytest.fixture(scope="session")
def decoded_corpus():
    """name -> DecodedAudio, computed lazily and disk-cached."""
    from lbaudiodetective_tpu.io.decode import DecodedAudio, decode_audio_file

    io_key = _io_code_hash()

    def load(name):
        cache_file = CACHE / f"decoded_{io_key}_{name}.npz"
        if cache_file.exists():
            z = np.load(cache_file)
            return DecodedAudio(samples=z["samples"],
                                processing_rate=float(z["processing_rate"]),
                                file_frames=int(z["file_frames"]),
                                file_rate=float(z["file_rate"]))
        d = decode_audio_file(corpus_path(name))
        np.savez(cache_file, samples=d.samples, processing_rate=d.processing_rate,
                 file_frames=d.file_frames, file_rate=d.file_rate)
        return d

    return _LazyDict(load)


def _pipeline_code_hash() -> str:
    """Hash of every source file that can change fingerprint bits.

    Keying fixture caches on code content (not just config params) guarantees
    that mutating the extraction pipeline invalidates the committed corpus
    fingerprints — a regression recomputes live and fails loudly instead of
    staying silently green against stale fixtures.
    """
    import hashlib

    pkg = REPO_ROOT / "lbaudiodetective_tpu"
    # Only files that determine fingerprint BITS.  ops/match*.py is excluded
    # deliberately: matching always runs live in the corpus tests (the cached
    # fixtures are fingerprints, not matrices), so a matcher regression is
    # caught regardless and match-only edits shouldn't churn the fixtures.
    files = sorted(
        [pkg / "config.py", pkg / "ops" / "extract.py", pkg / "ops" / "spectral.py",
         pkg / "ops" / "dft.py", pkg / "ops" / "haar.py"]
        + list(pkg.glob("ops/pallas/*.py"))
        + list(pkg.glob("oracle/*.py"))
        + list(pkg.glob("io/*.py"))
        + list(pkg.glob("io/native/*.cpp")))
    h = hashlib.sha256()
    for f in files:
        h.update(f.name.encode())
        h.update(f.read_bytes())
    return h.hexdigest()[:8]


def config_cache_key():
    """Cache key: config-params hash + pipeline code-content hash."""
    from lbaudiodetective_tpu.config import FingerprintConfig
    from lbaudiodetective_tpu.utils.serialize import config_params_hash

    return f"{config_params_hash(FingerprintConfig())[:8]}-{_pipeline_code_hash()}"


@pytest.fixture(scope="session")
def oracle_fingerprints(decoded_corpus):
    """name -> (pos, neg) golden-oracle fingerprints, lazy + disk-cached."""
    from lbaudiodetective_tpu.config import FingerprintConfig
    from lbaudiodetective_tpu.oracle.pipeline import oracle_fingerprint

    cfg = FingerprintConfig()
    key = config_cache_key()

    def load(name):
        cache_file = CACHE / f"oracle_{key}_{name}.npz"
        if cache_file.exists():
            z = np.load(cache_file)
            return (z["pos"], z["neg"])
        pos, neg = oracle_fingerprint(decoded_corpus[name], cfg)
        np.savez(cache_file, pos=pos, neg=neg)
        return (pos, neg)

    return _LazyDict(load)


@pytest.fixture(scope="session")
def default_config():
    from lbaudiodetective_tpu.config import FingerprintConfig

    return FingerprintConfig()


def _prune_stale_fixture_caches() -> None:
    """Delete code-hash-keyed fixture files whose key is no longer current.

    Every kernel edit mints a new key; without pruning, superseded
    ``jaxfp_*``/``oracle_*`` generations accumulate on disk AND in git
    (advisor r3 finding: four byte-identical jaxfp sets were committed
    under stale keys).  Deleting here keeps the working tree clean so a
    normal ``git add -A`` records the removals.  decoded_* files key on the
    io-code hash computed in :func:`decoded_corpus`; they are pruned by
    prefix match against the current key set too.
    """
    try:
        current = config_cache_key()
    except Exception:
        return
    for f in CACHE.glob("jaxfp_*.npz"):
        if not f.name.startswith(f"jaxfp_{current}_"):
            f.unlink(missing_ok=True)
    for f in CACHE.glob("oracle_*.npz"):
        if not f.name.startswith(f"oracle_{current}_"):
            f.unlink(missing_ok=True)
    io_key = _io_code_hash()
    for f in CACHE.glob("decoded_*.npz"):
        if not f.name.startswith(f"decoded_{io_key}_"):
            f.unlink(missing_ok=True)


_prune_stale_fixture_caches()
