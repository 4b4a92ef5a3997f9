"""Test-time import shims for trivially-absent reference dependencies.

The reference's pure-Python algorithm modules (span finder, synonym
generation, autocuration, curation merge) sit behind ``kazu.data``,
which imports ``bson`` and ``cattrs`` for *serialization only*. Neither
library is in this container, and the differential tests never
serialize — so these minimal stand-ins satisfy the imports and nothing
else. ``unstructure``/``structure`` raise if ever actually called,
guaranteeing a test can't silently rely on shimmed serialization.

Used ONLY by tests importing ``/root/reference`` for differential
checks; the engine itself never touches this module.
"""

from __future__ import annotations

import sys
import types


def install_shims() -> None:
    if "bson" not in sys.modules:
        bson = types.ModuleType("bson")

        class ObjectId:
            _counter = 0

            def __init__(self, *args):
                ObjectId._counter += 1
                self._v = ObjectId._counter

            def __eq__(self, other):
                return isinstance(other, ObjectId) and other._v == self._v

            def __hash__(self):
                return hash(("shim-oid", self._v))

            def __str__(self):
                return f"{self._v:024d}"

        bson.ObjectId = ObjectId
        json_util = types.ModuleType("bson.json_util")
        json_util.default = lambda v: {"$oid": str(v)}
        json_util.object_hook = lambda v: v
        bson.json_util = json_util
        sys.modules["bson"] = bson
        sys.modules["bson.json_util"] = json_util

    if "cachetools" not in sys.modules:
        cachetools = types.ModuleType("cachetools")

        class LFUCache(dict):
            def __init__(self, maxsize=128, *a, **k):
                super().__init__()

        cachetools.LFUCache = LFUCache
        sys.modules["cachetools"] = cachetools

    if "cattrs" not in sys.modules:
        def _refuse(*a, **k):
            raise NotImplementedError(
                "cattrs is shimmed for import only; differential tests must "
                "not exercise reference (de)serialization"
            )

        class _Converter:
            def register_unstructure_hook(self, *a, **k):
                pass

            def register_structure_hook(self, *a, **k):
                pass

            unstructure = staticmethod(_refuse)
            structure = staticmethod(_refuse)

        cattrs = types.ModuleType("cattrs")
        preconf = types.ModuleType("cattrs.preconf")
        preconf_json = types.ModuleType("cattrs.preconf.json")
        preconf_json.make_converter = lambda **k: _Converter()
        preconf_json.JsonConverter = _Converter
        strategies = types.ModuleType("cattrs.strategies")
        gen = types.ModuleType("cattrs.gen")
        gen.make_dict_unstructure_fn = lambda *a, **k: _refuse
        gen.make_dict_structure_fn = lambda *a, **k: _refuse
        gen.override = lambda **k: None
        cattrs.preconf = preconf
        preconf.json = preconf_json
        cattrs.strategies = strategies
        cattrs.gen = gen
        cattrs.Converter = _Converter
        sys.modules["cattrs"] = cattrs
        sys.modules["cattrs.preconf"] = preconf
        sys.modules["cattrs.preconf.json"] = preconf_json
        sys.modules["cattrs.strategies"] = strategies
        sys.modules["cattrs.gen"] = gen

    if "transformers" not in sys.modules:
        # reached only through `from transformers import BatchEncoding,
        # PreTrainedTokenizerBase` style type imports in kazu.utils.utils;
        # the differential tests never tokenize
        transformers = types.ModuleType("transformers")

        class _Placeholder:
            def __init__(self, *a, **k):
                raise NotImplementedError("transformers is shimmed for import only")

        for name in (
            "BatchEncoding",
            "PreTrainedTokenizerBase",
            "AutoConfig",
            "AutoTokenizer",
            "AutoModel",
            "AutoModelForTokenClassification",
            "DataCollatorWithPadding",
            "PreTrainedModel",
        ):
            setattr(transformers, name, _Placeholder)
        file_utils = types.ModuleType("transformers.file_utils")
        file_utils.PaddingStrategy = _Placeholder
        tok_base = types.ModuleType("transformers.tokenization_utils_base")
        tok_base.TruncationStrategy = _Placeholder
        transformers.file_utils = file_utils
        transformers.tokenization_utils_base = tok_base
        sys.modules["transformers"] = transformers
        sys.modules["transformers.file_utils"] = file_utils
        sys.modules["transformers.tokenization_utils_base"] = tok_base

    if "torch" not in sys.modules:
        # the reference span finder uses exactly two tensor ops —
        # torch.argmax(x, dim) and torch.argwhere(x) — on small per-word
        # matrices; numpy implements both with identical semantics
        # (np int scalars support .item() like torch's), so the shim is
        # computationally faithful, not import-only
        import numpy as _np

        torch = types.ModuleType("torch")
        torch.Tensor = _np.ndarray
        torch.argmax = lambda t, dim=None: _np.argmax(t, axis=dim)
        torch.argwhere = lambda t: _np.argwhere(t)

        def _no_torch(*a, **k):
            raise NotImplementedError(
                "torch is shimmed for the two span-finder ops only"
            )

        torch.cosine_similarity = _no_torch
        torch.softmax = _no_torch
        torch.no_grad = _no_torch

        class _TorchPlaceholder:
            def __init__(self, *a, **k):
                raise NotImplementedError(
                    "torch is shimmed for the two span-finder ops only"
                )

            # generic-subscript support so `class X(Dataset[T])` imports
            def __class_getitem__(cls, item):
                return cls

        utils = types.ModuleType("torch.utils")
        utils_data = types.ModuleType("torch.utils.data")
        utils_data.DataLoader = _TorchPlaceholder
        utils_data.Dataset = _TorchPlaceholder
        utils_data.IterableDataset = _TorchPlaceholder
        utils.data = utils_data
        torch.utils = utils
        nn = types.ModuleType("torch.nn")
        nn.Module = _TorchPlaceholder
        torch.nn = nn
        sys.modules["torch"] = torch
        sys.modules["torch.utils"] = utils
        sys.modules["torch.utils.data"] = utils_data
        sys.modules["torch.nn"] = nn

    if "tokenizers" not in sys.modules:
        tokenizers = types.ModuleType("tokenizers")

        class _Encoding:
            def __init__(self, *a, **k):
                raise NotImplementedError("tokenizers is shimmed for import only")

        tokenizers.Encoding = _Encoding
        sys.modules["tokenizers"] = tokenizers

    if "diskcache" not in sys.modules:
        # behaviourally faithful: memoize() without a cache is the
        # original function (kazu uses it purely as an optimization)
        diskcache = types.ModuleType("diskcache")

        class _Cache:
            def __init__(self, *a, **k):
                pass

            def memoize(self, *a, **k):
                def deco(fn):
                    return fn

                return deco

        diskcache.Cache = _Cache
        sys.modules["diskcache"] = diskcache

    if "cachetools" not in sys.modules:
        # LFUCache used as a plain bounded mapping; an unbounded dict
        # subclass is behaviourally faithful at test sizes
        cachetools = types.ModuleType("cachetools")

        class _LFUCache(dict):
            def __init__(self, maxsize=0, *a, **k):
                super().__init__()

        cachetools.LFUCache = _LFUCache
        sys.modules["cachetools"] = cachetools

    if "tqdm" not in sys.modules:
        # behaviourally faithful: tqdm is a progress decorator; the
        # identity pass-through preserves iteration exactly
        tqdm_mod = types.ModuleType("tqdm")

        def _tqdm(iterable=None, *a, **k):
            return iterable

        tqdm_mod.tqdm = _tqdm
        auto = types.ModuleType("tqdm.auto")
        auto.tqdm = _tqdm
        tqdm_mod.auto = auto
        sys.modules["tqdm"] = tqdm_mod
        sys.modules["tqdm.auto"] = auto

    if "rapidfuzz" not in sys.modules:
        def _no_fuzz(*a, **k):
            raise NotImplementedError("rapidfuzz is shimmed for import only")

        rapidfuzz = types.ModuleType("rapidfuzz")
        fuzz = types.ModuleType("rapidfuzz.fuzz")
        process = types.ModuleType("rapidfuzz.process")
        for mod in (fuzz, process):
            mod.__getattr__ = lambda name: _no_fuzz
        rapidfuzz.fuzz = fuzz
        rapidfuzz.process = process
        sys.modules["rapidfuzz"] = rapidfuzz
        sys.modules["rapidfuzz.fuzz"] = fuzz
        sys.modules["rapidfuzz.process"] = process

    if "scipy" not in sys.modules:
        class _SciPlaceholder:
            def __init__(self, *a, **k):
                raise NotImplementedError("scipy is shimmed for import only")

            def __class_getitem__(cls, item):
                return cls

        scipy = types.ModuleType("scipy")
        sparse = types.ModuleType("scipy.sparse")
        sparse.csr_matrix = _SciPlaceholder
        sparse.vstack = _SciPlaceholder
        scipy.sparse = sparse
        sys.modules["scipy"] = scipy
        sys.modules["scipy.sparse"] = sparse

    if "rdflib" not in sys.modules:
        class _RdfPlaceholder:
            def __init__(self, *a, **k):
                raise NotImplementedError("rdflib is shimmed for import only")

            def __class_getitem__(cls, item):
                return cls

        rdflib = types.ModuleType("rdflib")
        for name in ("Graph", "Literal", "BNode"):
            setattr(rdflib, name, _RdfPlaceholder)

        class _SeqPath:
            """Value-object stand-in for rdflib.paths.SequencePath: the
            parsers only construct and pass these around."""

            def __init__(self, *args):
                self.args = args

            def __truediv__(self, other):
                return _SeqPath(*self.args, other)

            def __eq__(self, other):
                return isinstance(other, _SeqPath) and self.args == other.args

            def __hash__(self):
                return hash(("seq-path", self.args))

        class _URIRef(str):
            """Value-object stand-in: parsers construct URIRefs in
            signature defaults and compose paths with ``/``."""

            def __truediv__(self, other):
                return _SeqPath(self, other)

        class _Namespace(str):
            def __getattr__(self, name):
                return _URIRef(str(self) + name)

        rdflib.URIRef = _URIRef
        rdflib.Namespace = _Namespace
        rdflib.RDFS = _Namespace("http://www.w3.org/2000/01/rdf-schema#")
        rdflib.RDF = _Namespace("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
        paths = types.ModuleType("rdflib.paths")
        paths.Path = _SeqPath
        paths.SequencePath = _SeqPath
        term = types.ModuleType("rdflib.term")
        term.Node = _RdfPlaceholder
        rdflib.paths = paths
        rdflib.term = term
        query = types.ModuleType("rdflib.query")
        query.ResultRow = _RdfPlaceholder
        rdflib.query = query
        sys.modules["rdflib"] = rdflib
        sys.modules["rdflib.paths"] = paths
        sys.modules["rdflib.term"] = term
        sys.modules["rdflib.query"] = query

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def load_reference_module(alias: str, relpath: str):
    """Load one reference module FILE directly, bypassing package
    ``__init__`` chains that import spacy/torch-model steps the shims
    can't (and shouldn't) fake. The module's own ``from kazu.x import``
    lines still resolve through the real package."""
    import importlib.util

    install_shims()
    if alias in sys.modules:
        return sys.modules[alias]
    spec = importlib.util.spec_from_file_location(alias, f"/root/reference/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    spec.loader.exec_module(mod)
    return mod


def install_spacy_shims() -> None:
    """Name-only stand-ins for the spacy modules
    ``kazu/utils/abbreviation_detector.py`` imports at module level
    (Matcher is only instantiated inside KazuAbbreviationDetector, which
    the differential never constructs), plus a fake
    ``kazu.utils.spacy_pipeline`` so the real one (which needs genuine
    spacy tokenizer machinery) is never executed."""
    install_shims()
    # additive: other differential tests install partial stubs of the
    # same module names (e.g. the numeric-splitter test's spacy_pipeline
    # without basic_spacy_pipeline) — fill in whatever is missing rather
    # than skipping on presence
    spacy = sys.modules.setdefault("spacy", types.ModuleType("spacy"))
    matcher = sys.modules.setdefault("spacy.matcher", types.ModuleType("spacy.matcher"))
    tokens = sys.modules.setdefault("spacy.tokens", types.ModuleType("spacy.tokens"))

    class _NeverConstruct:
        def __init__(self, *a, **k):
            raise RuntimeError("spacy shim: not constructible in tests")

    if not hasattr(matcher, "Matcher"):
        matcher.Matcher = _NeverConstruct
    if not hasattr(tokens, "Span"):
        tokens.Span = object
    if not hasattr(tokens, "Doc"):
        tokens.Doc = object
    spacy.matcher = matcher
    spacy.tokens = tokens

    sp = sys.modules.setdefault(
        "kazu.utils.spacy_pipeline", types.ModuleType("kazu.utils.spacy_pipeline")
    )
    if not hasattr(sp, "BASIC_PIPELINE_NAME"):
        sp.BASIC_PIPELINE_NAME = "basic"
    if not hasattr(sp, "SpacyPipelines"):

        class SpacyPipelines:
            def __init__(self, *a, **k):
                raise RuntimeError("spacy_pipeline shim: not usable in tests")

            @staticmethod
            def add_from_func(*a, **k):
                raise RuntimeError("spacy_pipeline shim")

        sp.SpacyPipelines = SpacyPipelines
    if not hasattr(sp, "basic_spacy_pipeline"):
        sp.basic_spacy_pipeline = sp.SpacyPipelines
