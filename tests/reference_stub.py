"""Import shims that make the ACTUAL reference PyTorch package runnable.

The reference (``/root/reference/graphphysics``) depends on
``torch_geometric``, ``dgl.sparse`` and ``loguru``, none of which are in
this image. For cross-framework parity tests we want to execute the
reference modules themselves — so this module installs small FUNCTIONAL
stand-ins before the reference is imported:

* ``torch_geometric.nn.MessagePassing`` — a working ``propagate`` for
  ``aggr="add", flow="source_to_target"`` with PyG's ``_i``/``_j`` suffix
  resolution (targets/sources), enough to run the reference
  ``GraphNetBlock`` (reference layers.py:890-1149) bit-for-bit.
* ``dgl.sparse`` — dense-backed ``spmatrix`` / ``bsddmm`` / ``bspmm`` /
  per-row sparse ``softmax`` implementing the batched semantics the
  reference attention uses (reference layers.py:493-561): values live on
  the edge list, batch axis last.
* ``loguru`` / ``torch_geometric.data.Data`` — inert carriers.

Installing ``dgl.sparse`` FIRST matters: the reference's
``HAS_DGL_SPARSE`` flag is resolved at import time of
``graphphysics.models.layers`` / ``processors`` and selects the sparse
code path these tests exercise.
"""

from __future__ import annotations

import inspect
import math
import sys
import types

import torch

REF_ROOT = "/root/reference"


# ----------------------------------------------------------------------
# torch_geometric stub
# ----------------------------------------------------------------------

class Data:
    """Attribute bag matching torch_geometric.data.Data usage here."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    @property
    def num_nodes(self):
        for name in ("x", "pos"):
            v = self.__dict__.get(name)
            if v is not None:
                return v.size(0)
        return None

    def clone(self):
        out = {}
        for k, v in self.__dict__.items():
            out[k] = v.clone() if isinstance(v, torch.Tensor) else v
        return Data(**out)

    def to(self, _device, non_blocking=False):
        return self


class MessagePassing(torch.nn.Module):
    """Functional subset of PyG MessagePassing.

    Supports what the reference GraphNetBlock needs: sum aggregation with
    ``flow="source_to_target"`` (messages aggregate at ``edge_index[1]``),
    and keyword resolution where ``name_j`` gathers rows at
    ``edge_index[0]`` (sources) and ``name_i`` at ``edge_index[1]``
    (targets) of any ``name`` passed to ``propagate``.
    """

    def __init__(self, aggr: str = "add", flow: str = "source_to_target",
                 **_kw):
        super().__init__()
        if aggr != "add" or flow != "source_to_target":
            raise NotImplementedError(
                f"stub MessagePassing only supports aggr='add', "
                f"flow='source_to_target' (got {aggr!r}, {flow!r})"
            )

    def propagate(self, edge_index, size=None, **kwargs):
        src, dst = edge_index[0], edge_index[1]

        def resolve(names):
            out = {}
            for name in names:
                if name.endswith("_j") and name[:-2] in kwargs:
                    out[name] = kwargs[name[:-2]][src]
                elif name.endswith("_i") and name[:-2] in kwargs:
                    out[name] = kwargs[name[:-2]][dst]
                elif name in kwargs:
                    out[name] = kwargs[name]
            return out

        msg = self.message(**resolve(inspect.signature(self.message).parameters))
        n = size[1] if size is not None else int(edge_index.max()) + 1
        aggr_out = torch.zeros((n,) + msg.shape[1:], dtype=msg.dtype)
        aggr_out.index_add_(0, dst, msg)
        upd_names = list(inspect.signature(self.update).parameters)[1:]
        return self.update(aggr_out, **resolve(upd_names))

    def message(self, x_j):  # pragma: no cover - default never used here
        return x_j

    def update(self, aggr_out):  # pragma: no cover
        return aggr_out


# ----------------------------------------------------------------------
# torch_geometric.transforms / utils stubs (functional, PyG semantics)
#
# Caveat: these re-implement PyG's documented behavior (FaceToEdge,
# Cartesian(norm=False), Distance(norm=False), to_undirected-with-
# coalesce) — they are independent code, but they encode the SAME reading
# of the PyG contract as this repo's numpy implementations, so a shared
# misreading of e.g. the Cartesian sign convention would not be caught.
# The norm column and all set-level/edge-topology checks are
# convention-free.
# ----------------------------------------------------------------------


def to_undirected(edge_index: torch.Tensor, num_nodes=None) -> torch.Tensor:
    """Reverse-union + coalesce (dedup, sorted row-major), as PyG."""
    e = edge_index.long()
    n = int(num_nodes) if num_nodes is not None else int(e.max()) + 1
    both = torch.cat([e, torch.stack([e[1], e[0]])], dim=1)
    key = torch.unique(both[0] * n + both[1], sorted=True)
    return torch.stack([key // n, key % n])


class BaseTransform:
    pass


class Compose(BaseTransform):
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data


class FaceToEdge(BaseTransform):
    """data.face [3, F] -> undirected data.edge_index."""

    def __init__(self, remove_faces: bool = True):
        self.remove_faces = remove_faces

    def __call__(self, data):
        face = data.face
        edge_index = torch.cat([face[:2], face[1:], face[::2]], dim=1)
        data.edge_index = to_undirected(edge_index, num_nodes=data.num_nodes)
        if self.remove_faces:
            data.face = None
        return data


class Cartesian(BaseTransform):
    """Appends pos[src] - pos[dst] to edge_attr (norm=False only)."""

    def __init__(self, norm: bool = True, cat: bool = True):
        if norm:
            raise NotImplementedError("stub Cartesian supports norm=False")
        self.cat = cat

    def __call__(self, data):
        row, col = data.edge_index[0], data.edge_index[1]
        cart = data.pos[row] - data.pos[col]
        pseudo = getattr(data, "edge_attr", None)
        if pseudo is not None and self.cat:
            data.edge_attr = torch.cat(
                [pseudo, cart.type_as(data.pos)], dim=-1
            )
        else:
            data.edge_attr = cart
        return data


class Distance(BaseTransform):
    """Appends ||pos[dst] - pos[src]|| to edge_attr (norm=False only)."""

    def __init__(self, norm: bool = True, cat: bool = True):
        if norm:
            raise NotImplementedError("stub Distance supports norm=False")
        self.cat = cat

    def __call__(self, data):
        row, col = data.edge_index[0], data.edge_index[1]
        dist = torch.norm(data.pos[col] - data.pos[row], p=2, dim=-1).view(
            -1, 1
        )
        pseudo = getattr(data, "edge_attr", None)
        if pseudo is not None and self.cat:
            data.edge_attr = torch.cat(
                [pseudo, dist.type_as(data.pos)], dim=-1
            )
        else:
            data.edge_attr = dist
        return data


# ----------------------------------------------------------------------
# torch_geometric pooling stubs (SelectTopK / KNNGraph / knn_interpolate)
#
# The reference DownSampler consumes ONLY select_out.node_index, and every
# PyG score nonlinearity (softmax / tanh / score-over-norm) is monotone —
# so the stub ranks by the raw projected score; the selected set is
# identical to PyG's for any nonlinearity choice.
# ----------------------------------------------------------------------


class SelectTopK(torch.nn.Module):
    """score = (attn · weight), keep top ceil(ratio·N) (PyG SelectTopK)."""

    def __init__(self, in_channels, ratio=0.5, min_score=None, act="tanh"):
        super().__init__()
        self.ratio = ratio
        self.weight = torch.nn.Parameter(torch.randn(1, in_channels))

    def forward(self, attn, batch=None):
        score = (attn * self.weight).sum(dim=-1)
        k = math.ceil(self.ratio * attn.size(0))
        node_index = torch.topk(score, k).indices
        return types.SimpleNamespace(node_index=node_index)


class KNNGraph:
    """PyG KNNGraph transform: k nearest non-self neighbors in pos space;
    force_undirected closes + dedups via to_undirected."""

    def __init__(self, k=6, loop=False, force_undirected=False):
        self.k = k
        self.loop = loop
        self.force_undirected = force_undirected

    def __call__(self, data):
        pos = data.pos
        n = pos.size(0)
        d2 = torch.cdist(pos, pos) ** 2
        if not self.loop:
            d2.fill_diagonal_(float("inf"))
        k = min(self.k, n - (0 if self.loop else 1))
        nbr = torch.topk(d2, k, largest=False).indices  # [N, k]
        dst = torch.arange(n).repeat_interleave(k)
        src = nbr.reshape(-1)
        edge_index = torch.stack([src, dst])
        if self.force_undirected:
            edge_index = to_undirected(edge_index, num_nodes=n)
        data.edge_index = edge_index
        return data


def knn_interpolate(x, pos_x, pos_y, batch_x=None, batch_y=None, k=3):
    """Inverse-square-distance weighted kNN interpolation (PyG)."""
    d2 = torch.cdist(pos_y, pos_x) ** 2  # [N, M]
    kk = min(k, pos_x.size(0))
    dist, idx = torch.topk(d2, kk, largest=False)  # [N, kk]
    w = 1.0 / torch.clamp(dist, min=1e-16)
    num = (x[idx] * w.unsqueeze(-1)).sum(dim=1)
    return num / w.sum(dim=1, keepdim=True)


# ----------------------------------------------------------------------
# dgl.sparse stub (dense-backed, exact semantics on the edge list)
# ----------------------------------------------------------------------

class SparseMatrix:
    """(indices [2, E], shape (N, N), val [E] or [E, B])."""

    def __init__(self, indices, shape, val=None):
        self.indices = indices
        self.shape = shape
        if val is None:
            val = torch.ones(indices.shape[1])
        self.val = val

    def softmax(self) -> "SparseMatrix":
        """Row-wise softmax over the stored entries (dgl A.softmax())."""
        row = self.indices[0]
        v = self.val
        squeeze = v.dim() == 1
        vv = v.unsqueeze(1) if squeeze else v
        m = torch.full((self.shape[0], vv.shape[1]), float("-inf"),
                       dtype=vv.dtype)
        m.index_reduce_(0, row, vv, "amax", include_self=True)
        e = torch.exp(vv - m[row])
        den = torch.zeros_like(m).index_add_(0, row, e)
        out = e / den[row]
        return SparseMatrix(self.indices, self.shape,
                            out.squeeze(1) if squeeze else out)

    def astype(self, dtype) -> "SparseMatrix":
        return SparseMatrix(self.indices, self.shape, self.val.to(dtype))


def spmatrix(indices, val=None, shape=None) -> SparseMatrix:
    if shape is None:
        n = int(indices.max()) + 1
        shape = (n, n)
    return SparseMatrix(indices, shape, val)


def bsddmm(A: SparseMatrix, x1: torch.Tensor, x2: torch.Tensor) -> SparseMatrix:
    """Sampled (batched) dense-dense matmul: val[e, b] = x1[row_e, :, b] ·
    x2[:, col_e, b]; x1 [N, D, B], x2 [D, N, B]."""
    row, col = A.indices[0], A.indices[1]
    val = torch.einsum("edb,edb->eb", x1[row], x2.permute(1, 0, 2)[col])
    return SparseMatrix(A.indices, A.shape, val)


def bspmm(attn: SparseMatrix, v: torch.Tensor) -> torch.Tensor:
    """out[i, :, b] = Σ_{(i,j) ∈ A} val[e, b] · v[j, :, b]; v [N, D, B]."""
    row, col = attn.indices[0], attn.indices[1]
    out = torch.zeros_like(v)
    out.index_add_(0, row, v[col] * attn.val.unsqueeze(1))
    return out


# ----------------------------------------------------------------------


def install_reference() -> None:
    """Install all stubs (idempotent) and put the reference on sys.path."""
    if "dgl" not in sys.modules:
        dgl = types.ModuleType("dgl")
        dgl_sparse = types.ModuleType("dgl.sparse")
        dgl_sparse.SparseMatrix = SparseMatrix
        dgl_sparse.spmatrix = spmatrix
        dgl_sparse.bsddmm = bsddmm
        dgl_sparse.bspmm = bspmm
        dgl.sparse = dgl_sparse
        sys.modules["dgl"] = dgl
        sys.modules["dgl.sparse"] = dgl_sparse
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgd = types.ModuleType("torch_geometric.data")
        tgd.Data = Data
        tgn = types.ModuleType("torch_geometric.nn")
        tgn.MessagePassing = MessagePassing

        class TransformerConv(torch.nn.Module):
            """Import-time placeholder only: the reference instantiates it
            solely on the no-DGL fallback path, which these tests never
            take (the dgl.sparse stub is installed)."""

            def __init__(self, *a, **k):  # pragma: no cover
                raise NotImplementedError(
                    "stub TransformerConv must not be constructed"
                )

        tgn.TransformerConv = TransformerConv
        tgt = types.ModuleType("torch_geometric.transforms")
        tgt.BaseTransform = BaseTransform
        tgt.Compose = Compose
        tgt.FaceToEdge = FaceToEdge
        tgt.Cartesian = Cartesian
        tgt.Distance = Distance
        tgt.KNNGraph = KNNGraph
        tgu = types.ModuleType("torch_geometric.utils")
        tgu.to_undirected = to_undirected

        # import-time placeholders for the reference's dataset/loader
        # modules (pulled in transitively by lightning_module via
        # parse_parameters); the parity tests never call them.
        def _tg_unavailable(*_a, **_k):  # pragma: no cover
            raise NotImplementedError(
                "torch_geometric stub: dataset/loader machinery not available"
            )

        tgu.add_random_edge = _tg_unavailable
        tgu.subgraph = _tg_unavailable
        tgu_nn = types.ModuleType("torch_geometric.utils.num_nodes")

        def maybe_num_nodes(edge_index, num_nodes=None):
            if num_nodes is not None:
                return num_nodes
            return int(edge_index.max()) + 1

        tgu_nn.maybe_num_nodes = maybe_num_nodes
        tgu.num_nodes = tgu_nn
        tgd.Dataset = torch.utils.data.Dataset
        tg_loader = types.ModuleType("torch_geometric.loader")
        tg_loader.ClusterData = _tg_unavailable
        tg_loader.ClusterLoader = _tg_unavailable
        tg_loader.DataLoader = _tg_unavailable
        tgd.Batch = Data  # Batch used only as a carrier here
        tg_pool = types.ModuleType("torch_geometric.nn.pool")
        tg_select = types.ModuleType("torch_geometric.nn.pool.select")
        tg_select.SelectTopK = SelectTopK
        tg_pool.select = tg_select
        tg_unpool = types.ModuleType("torch_geometric.nn.unpool")
        tg_unpool.knn_interpolate = knn_interpolate
        tgn.pool = tg_pool
        tgn.unpool = tg_unpool
        tg.data = tgd
        tg.nn = tgn
        tg.transforms = tgt
        tg.utils = tgu
        sys.modules.update(
            {
                "torch_geometric": tg,
                "torch_geometric.data": tgd,
                "torch_geometric.nn": tgn,
                "torch_geometric.nn.pool": tg_pool,
                "torch_geometric.nn.pool.select": tg_select,
                "torch_geometric.nn.unpool": tg_unpool,
                "torch_geometric.transforms": tgt,
                "torch_geometric.utils": tgu,
                "torch_geometric.utils.num_nodes": tgu_nn,
                "torch_geometric.loader": tg_loader,
            }
        )
    if "meshio" not in sys.modules:
        # import-time carrier only: graphphysics.utils.meshio_mesh needs
        # ``meshio.Mesh`` for its annotations; the IO entry points are
        # never reached by the parity tests (validation_step's XDMF dump
        # runs only for trajectory index 0).
        meshio = types.ModuleType("meshio")

        class _MeshioMesh:
            def __init__(self, points=None, cells=None, point_data=None,
                         **kw):
                self.points = points
                self.cells = cells if cells is not None else []
                self.point_data = point_data if point_data is not None else {}

        def _meshio_unavailable(*_a, **_k):  # pragma: no cover
            raise NotImplementedError("meshio stub: file IO not available")

        meshio.Mesh = _MeshioMesh
        meshio.read = _meshio_unavailable
        meshio.write = _meshio_unavailable
        meshio_xdmf = types.ModuleType("meshio.xdmf")

        class _TimeSeriesWriter:  # pragma: no cover
            def __init__(self, *_a, **_k):
                raise NotImplementedError(
                    "meshio stub: TimeSeriesWriter not available"
                )

        meshio_xdmf.TimeSeriesWriter = _TimeSeriesWriter
        meshio.xdmf = meshio_xdmf
        sys.modules["meshio"] = meshio
        sys.modules["meshio.xdmf"] = meshio_xdmf
    if "lightning" not in sys.modules:
        # Functional pytorch-lightning stand-in: enough of the
        # LightningModule base for the reference's rollout/validation
        # state machine (lightning_module.py:375-493) to run UNMODIFIED.
        # ``log``/``log_dict`` record every value into ``self.logged`` so
        # tests can assert on the reference's own aggregated metrics.
        lightning = types.ModuleType("lightning")

        class _LightningModule(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.logged = {}

            @property
            def device(self):
                return torch.device("cpu")

            @property
            def current_epoch(self):
                return 0

            def save_hyperparameters(self, *_a, **_k):
                pass

            def log(self, name, value, **_kw):
                self.logged.setdefault(name, []).append(float(value))

            def log_dict(self, d, **_kw):
                for k, v in d.items():
                    self.log(k, v)

        lightning.LightningModule = _LightningModule
        sys.modules["lightning"] = lightning
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, _k):
                return lambda *a, **kw: None

        lg.logger = _Logger()
        sys.modules["loguru"] = lg
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
