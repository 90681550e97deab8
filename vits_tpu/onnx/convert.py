"""jaxpr → ONNX graph converter.

The TPU-native analog of the reference's `torch.onnx.export` calls
(emotional-vits/export.py:199-226): instead of tracing a torch module, we
trace the jitted inference functions with `jax.make_jaxpr` and translate the
resulting jaxpr equation-by-equation into ONNX (opset 17) nodes, emitted with
the dependency-free writer in `vits_tpu.onnx.proto`.

Design notes:
- Model parameters are traced as arguments; their invars are bound to
  numpy constants and become graph initializers (weight-norm must be folded
  first — `nn.fold_weight_norm` — so only plain kernels appear).
- Any equation whose inputs are all constants is folded at export time
  (evaluated with jax on host) — this eliminates iota/mask tables, the
  subpixel tap-gather machinery, and static-index gathers entirely.
- `broadcast_in_dim` is translated lazily: elementwise consumers rely on
  ONNX's numpy-style implicit broadcasting (we only emit a Reshape to a
  broadcast-compatible rank), so graphs stay valid under dynamic axes;
  non-broadcasting consumers force a real Expand.
- Reshapes use 0 (copy-dim) / -1 (infer) target entries whenever the
  traced shapes allow, so attention-head splits etc. remain length-agnostic.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from . import proto

# fold results larger than this (bytes) are not folded symbolic-side
# (they would bloat the file); the op is emitted symbolically instead.
_FOLD_CAP = 1 << 22

_INT64_MAX = (1 << 63) - 1


@dataclasses.dataclass
class Sym:
    """A symbolic ONNX tensor value."""
    name: str
    shape: tuple
    dtype: Any
    # when set, `name` refers to a Reshaped-but-not-Expanded broadcast whose
    # full shape is `shape`; elementwise consumers may use it directly.
    bcast_of: str | None = None


class Builder:
    def __init__(self):
        self.nodes = []
        self.initializers = []
        self._init_names = {}
        self._n = 0

    def fresh(self, hint="v"):
        self._n += 1
        return f"{hint}_{self._n}"

    def add_node(self, op, inputs, outputs, **attrs):
        self.nodes.append(proto.node(op, inputs, outputs,
                                     name=self.fresh(op.lower()), **attrs))

    def add_initializer(self, arr: np.ndarray, hint="c") -> str:
        arr = np.asarray(arr, order="C")  # ascontiguousarray promotes 0-d
        if arr.nbytes <= 1024:  # dedupe small constants by content
            key = (arr.dtype.str, arr.shape,
                   hashlib.sha1(arr.tobytes()).hexdigest())
            if key in self._init_names:
                return self._init_names[key]
        else:
            key = None
        name = self.fresh(hint)
        self.initializers.append(proto.tensor_proto(name, arr))
        if key is not None:
            self._init_names[key] = name
        return name


class Converter:
    def __init__(self, builder: Builder, dyn_dims=()):
        self.b = builder
        self.env = {}
        # [(graph_input_name, axis, traced_size)]: axes declared dynamic in
        # the I/O signature; slices that crop constants at exactly the traced
        # size are emitted as runtime Shape-driven slices so the graph stays
        # valid at other lengths (e.g. the text encoder's PE-table crop)
        self.dyn_dims = list(dyn_dims)
        self._shape_cache = {}

    def runtime_dim(self, src_name, axis):
        """(1,)-int64 tensor holding the runtime size of src's `axis`."""
        key = (src_name, axis)
        if key not in self._shape_cache:
            shp = self.b.fresh("shp")
            self.b.add_node("Shape", [src_name], [shp])
            idx = self.b.add_initializer(np.asarray([axis], np.int64), "axis")
            out = self.b.fresh("dim")
            self.b.add_node("Gather", [shp, idx], [out], axis=0)
            self._shape_cache[key] = out
        return self._shape_cache[key]

    def _dyn_crop_axes(self, in_shape, limits, starts, strides):
        """Axes where a slice crops down to a traced dynamic size."""
        out = []
        for ax in range(len(limits)):
            for src, src_axis, size in self.dyn_dims:
                # require the cropped axis to sit at the SAME position as the
                # dynamic source axis (e.g. PE-table crop axis 1 ↔ input_text
                # axis 1) — shrinks the window for coincidental size matches
                if (ax == src_axis and limits[ax] == size
                        and in_shape[ax] > size
                        and starts[ax] == 0 and strides[ax] == 1):
                    out.append((ax, src, src_axis))
                    break
        return out

    # ---------------------------------------------------------------- env

    def read(self, var):
        if isinstance(var, jax.extend.core.Literal):
            return np.asarray(var.val, dtype=var.aval.dtype)
        return self.env[var]

    def is_const(self, val):
        return isinstance(val, np.ndarray) or np.isscalar(val)

    def materialize(self, val, hint="c") -> str:
        """ONNX tensor name for a value (initializer if constant)."""
        if self.is_const(val):
            # param leaves carry their tree path → readable initializer names
            hint = getattr(self, "_const_hints", {}).get(id(val), hint)
            return self.b.add_initializer(np.asarray(val), hint)
        if val.bcast_of is not None:
            # a consumer that can't implicitly broadcast: emit the Expand
            out = self.b.fresh("expand")
            shape_t = self.b.add_initializer(
                np.asarray(val.shape, np.int64), "shape")
            self.b.add_node("Expand", [val.bcast_of, shape_t], [out])
            val.name, val.bcast_of = out, None
        return val.name

    def shape_of(self, val):
        return tuple(np.shape(val)) if self.is_const(val) else tuple(val.shape)

    def dtype_of(self, val):
        return np.asarray(val).dtype if self.is_const(val) else np.dtype(val.dtype)

    # ------------------------------------------------------------- driver

    def run(self, jaxpr, consts, invals):
        for var, c in zip(jaxpr.constvars, consts):
            self.env[var] = np.asarray(c)
        for var, v in zip(jaxpr.invars, invals):
            self.env[var] = v
        for eqn in jaxpr.eqns:
            self.eqn(eqn)
        return [self.read(v) for v in jaxpr.outvars]

    def _sub_jaxpr(self, params):
        for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
            if key in params:
                cj = params[key]
                if hasattr(cj, "jaxpr"):
                    return cj.jaxpr, cj.consts
                return cj, []
        return None, None

    def eqn(self, eqn):
        prim = eqn.primitive.name
        invals = [self.read(v) for v in eqn.invars]

        # call-like primitives: inline
        if prim in ("jit", "pjit", "closed_call", "core_call", "xla_call",
                    "custom_jvp_call", "custom_vjp_call", "remat", "checkpoint",
                    "custom_vjp_call_jaxpr", "sharding_constraint"):
            if prim == "sharding_constraint":
                self.env[eqn.outvars[0]] = invals[0]
                return
            sub, consts = self._sub_jaxpr(eqn.params)
            if sub is None:
                raise NotImplementedError(f"call prim {prim}: {eqn.params.keys()}")
            inner = Converter(self.b, self.dyn_dims)
            inner._shape_cache = self._shape_cache
            outs = inner.run(sub, consts, invals)
            for var, v in zip(eqn.outvars, outs):
                self.env[var] = v
            return

        # constant folding
        if all(self.is_const(v) for v in invals):
            out_elems = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars)
            out_bytes = sum(int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                            for v in eqn.outvars)
            # a broadcast that grows its input would bake trace-time shapes
            # (and bloat the file); keep it lazy instead so dynamic axes and
            # implicit broadcasting survive
            grows = prim == "broadcast_in_dim" and out_elems > max(
                int(np.prod(np.shape(invals[0]))), 1)
            # a slice that crops a constant at exactly a traced dynamic size
            # must stay symbolic (→ runtime Shape-driven slice)
            if prim == "slice" and self.dyn_dims:
                lims = list(eqn.params["limit_indices"])
                stts = list(eqn.params["start_indices"])
                strs = list(eqn.params["strides"] or [1] * len(lims))
                if self._dyn_crop_axes(np.shape(invals[0]), lims, stts, strs):
                    grows = True
            if not grows and (
                    out_bytes <= _FOLD_CAP or prim in (
                        "reshape", "transpose", "broadcast_in_dim", "slice",
                        "gather", "concatenate", "convert_element_type",
                        "iota", "rev", "squeeze")):
                outs = self._fold(eqn, invals)
                for var, v in zip(eqn.outvars, outs):
                    self.env[var] = np.asarray(v)
                return

        handler = getattr(self, f"h_{prim}", None)
        if handler is None:
            raise NotImplementedError(
                f"no ONNX handler for primitive '{prim}' "
                f"({[self.shape_of(v) for v in invals]})")
        out = handler(eqn, invals)
        outs = out if isinstance(out, (list, tuple)) else [out]
        for var, v in zip(eqn.outvars, outs):
            self.env[var] = v

    def _fold(self, eqn, invals):
        try:  # prefer host eval even when the process owns a TPU backend
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        import contextlib
        ctx = jax.default_device(cpu) if cpu is not None \
            else contextlib.nullcontext()
        with ctx:
            vals = [jnp.asarray(v) for v in invals]
            outs = eqn.primitive.bind(*vals, **eqn.params)
        if not eqn.primitive.multiple_results:
            outs = [outs]
        return [np.asarray(o) for o in outs]

    # -------------------------------------------------------- op emission

    def emit(self, eqn, op, invals, bcast_ok=False, **attrs):
        names = []
        for v in invals:
            if bcast_ok and not self.is_const(v) and v.bcast_of is not None:
                names.append(v.bcast_of)
            else:
                names.append(self.materialize(v))
        out = self.b.fresh(op.lower())
        self.b.add_node(op, names, [out], **attrs)
        aval = eqn.outvars[0].aval
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    # elementwise -----------------------------------------------------------

    def _ew_binary(self, eqn, op, invals):
        return self.emit(eqn, op, invals, bcast_ok=True)

    def h_add(self, eqn, iv):
        return self._ew_binary(eqn, "Add", iv)

    def h_sub(self, eqn, iv):
        return self._ew_binary(eqn, "Sub", iv)

    def h_mul(self, eqn, iv):
        return self._ew_binary(eqn, "Mul", iv)

    def h_div(self, eqn, iv):
        return self._ew_binary(eqn, "Div", iv)

    def h_max(self, eqn, iv):
        return self._ew_binary(eqn, "Max", iv)

    def h_min(self, eqn, iv):
        return self._ew_binary(eqn, "Min", iv)

    def h_pow(self, eqn, iv):
        return self._ew_binary(eqn, "Pow", iv)

    def h_rem(self, eqn, iv):
        return self.emit(eqn, "Mod", iv, bcast_ok=True, fmod=1)

    def h_and(self, eqn, iv):
        return self._ew_binary(eqn, "And", iv)

    def h_or(self, eqn, iv):
        return self._ew_binary(eqn, "Or", iv)

    def h_xor(self, eqn, iv):
        return self._ew_binary(eqn, "Xor", iv)

    def h_not(self, eqn, iv):
        return self.emit(eqn, "Not", iv)

    def h_exp(self, eqn, iv):
        return self.emit(eqn, "Exp", iv)

    def h_log(self, eqn, iv):
        return self.emit(eqn, "Log", iv)

    def h_tanh(self, eqn, iv):
        return self.emit(eqn, "Tanh", iv)

    def h_logistic(self, eqn, iv):
        return self.emit(eqn, "Sigmoid", iv)

    def h_neg(self, eqn, iv):
        return self.emit(eqn, "Neg", iv)

    def h_sign(self, eqn, iv):
        return self.emit(eqn, "Sign", iv)

    def h_abs(self, eqn, iv):
        return self.emit(eqn, "Abs", iv)

    def h_floor(self, eqn, iv):
        return self.emit(eqn, "Floor", iv)

    def h_ceil(self, eqn, iv):
        return self.emit(eqn, "Ceil", iv)

    def h_round(self, eqn, iv):
        return self.emit(eqn, "Round", iv)

    def h_sqrt(self, eqn, iv):
        return self.emit(eqn, "Sqrt", iv)

    def h_rsqrt(self, eqn, iv):
        s = self.emit(eqn, "Sqrt", iv)
        return self.emit(eqn, "Reciprocal", [s])

    def h_square(self, eqn, iv):
        return self.emit(eqn, "Mul", [iv[0], iv[0]])

    def h_sin(self, eqn, iv):
        return self.emit(eqn, "Sin", iv)

    def h_cos(self, eqn, iv):
        return self.emit(eqn, "Cos", iv)

    def h_erf(self, eqn, iv):
        return self.emit(eqn, "Erf", iv)

    def h_integer_pow(self, eqn, iv):
        y = eqn.params["y"]
        if y == 2:
            return self.emit(eqn, "Mul", [iv[0], iv[0]])
        expo = np.asarray(y, self.dtype_of(iv[0]))
        return self.emit(eqn, "Pow", [iv[0], expo])

    def h_stop_gradient(self, eqn, iv):
        return self.emit(eqn, "Identity", iv)

    def h_copy(self, eqn, iv):
        return self.emit(eqn, "Identity", iv)

    # comparisons -----------------------------------------------------------

    def h_lt(self, eqn, iv):
        return self._ew_binary(eqn, "Less", iv)

    def h_le(self, eqn, iv):
        return self._ew_binary(eqn, "LessOrEqual", iv)

    def h_gt(self, eqn, iv):
        return self._ew_binary(eqn, "Greater", iv)

    def h_ge(self, eqn, iv):
        return self._ew_binary(eqn, "GreaterOrEqual", iv)

    def h_eq(self, eqn, iv):
        return self._ew_binary(eqn, "Equal", iv)

    def h_ne(self, eqn, iv):
        e = self._ew_binary(eqn, "Equal", iv)
        return self.emit(eqn, "Not", [e])

    def h_select_n(self, eqn, iv):
        pred, *cases = iv
        if len(cases) != 2:
            raise NotImplementedError(f"select_n with {len(cases)} cases")
        if np.dtype(self.dtype_of(pred)) != np.bool_:
            raise NotImplementedError("select_n with integer predicate")
        # select_n picks cases[0] when pred is False → Where(pred, on_true, on_false)
        return self.emit(eqn, "Where", [pred, cases[1], cases[0]], bcast_ok=True)

    def h_convert_element_type(self, eqn, iv):
        to = proto.NP_TO_ONNX[np.dtype(eqn.params["new_dtype"])]
        return self.emit(eqn, "Cast", iv, to=to)

    # shape ops -------------------------------------------------------------

    @staticmethod
    def _unsqueeze_axes(in_shape, out_shape):
        """Axes to insert (len-1 dims) turning in_shape into out_shape, or
        None if the reshape is not a pure rank expansion."""
        for prefer_consume in (True, False):
            axes, ptr, ok = [], 0, True
            for i, d in enumerate(out_shape):
                consume = (ptr < len(in_shape) and in_shape[ptr] == d
                           and (d != 1 or prefer_consume
                                or len(out_shape) - i <= len(in_shape) - ptr))
                if consume:
                    ptr += 1
                elif d == 1:
                    axes.append(i)
                else:
                    ok = False
                    break
            if ok and ptr == len(in_shape):
                return axes
        return None

    def h_reshape(self, eqn, iv):
        if eqn.params.get("dimensions") is not None:
            perm = list(eqn.params["dimensions"])
            t = self.emit(eqn, "Transpose", iv, perm=perm)
            t.shape = tuple(np.asarray(self.shape_of(iv[0]))[perm])
            iv = [t]
        in_shape = self.shape_of(iv[0])
        out_shape = list(eqn.params["new_sizes"])
        aval = eqn.outvars[0].aval
        # pure rank changes become Unsqueeze/Squeeze so dynamic axes survive
        axes = self._unsqueeze_axes(in_shape, out_shape)
        if axes is not None and len(out_shape) > len(in_shape):
            axes_t = self.b.add_initializer(np.asarray(axes, np.int64), "axes")
            out = self.b.fresh("unsqueeze")
            self.b.add_node("Unsqueeze", [self.materialize(iv[0]), axes_t],
                            [out])
            return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))
        axes = self._unsqueeze_axes(out_shape, in_shape)
        if axes is not None and len(out_shape) < len(in_shape):
            axes_t = self.b.add_initializer(np.asarray(axes, np.int64), "axes")
            out = self.b.fresh("squeeze")
            self.b.add_node("Squeeze", [self.materialize(iv[0]), axes_t],
                            [out])
            return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))
        # prefer 0 (copy input dim) / one -1 so the reshape stays valid under
        # dynamic leading axes; only prefix positions where ranks align
        target = []
        used_infer = False
        for i, d in enumerate(out_shape):
            if i < len(in_shape) and in_shape[i] == d and all(
                    in_shape[j] == out_shape[j] for j in range(i)):
                target.append(0)
            elif not used_infer:
                target.append(-1)
                used_infer = True
            else:
                target.append(int(d))
        shape_t = self.b.add_initializer(np.asarray(target, np.int64), "shape")
        names = [self.materialize(iv[0]), shape_t]
        out = self.b.fresh("reshape")
        self.b.add_node("Reshape", names, [out])
        aval = eqn.outvars[0].aval
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    def h_squeeze(self, eqn, iv):
        axes = list(eqn.params["dimensions"])
        axes_t = self.b.add_initializer(np.asarray(axes, np.int64), "axes")
        out = self.b.fresh("squeeze")
        self.b.add_node("Squeeze", [self.materialize(iv[0]), axes_t], [out])
        aval = eqn.outvars[0].aval
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    def h_transpose(self, eqn, iv):
        return self.emit(eqn, "Transpose", iv,
                         perm=list(eqn.params["permutation"]))

    def h_broadcast_in_dim(self, eqn, iv):
        (x,) = iv
        out_shape = tuple(eqn.params["shape"])
        bdims = tuple(eqn.params["broadcast_dimensions"])
        in_shape = self.shape_of(x)
        # reshape x to rank(out) with singleton non-mapped dims
        mid = [1] * len(out_shape)
        for i, d in enumerate(bdims):
            mid[d] = in_shape[i]
        if tuple(mid) == tuple(in_shape):
            reshaped = self.materialize(x)
        else:
            # inserted axes are exactly the non-mapped output positions, so
            # this is always a pure Unsqueeze (length-agnostic)
            ins = sorted(set(range(len(out_shape))) - set(bdims))
            axes_t = self.b.add_initializer(np.asarray(ins, np.int64), "axes")
            reshaped = self.b.fresh("unsqueeze")
            self.b.add_node("Unsqueeze", [self.materialize(x), axes_t],
                            [reshaped])
        aval = eqn.outvars[0].aval
        if tuple(mid) == out_shape:
            return Sym(reshaped, out_shape, np.dtype(aval.dtype))
        # defer the Expand: elementwise consumers broadcast implicitly
        return Sym(reshaped, out_shape, np.dtype(aval.dtype),
                   bcast_of=reshaped)

    def h_slice(self, eqn, iv):
        starts = list(eqn.params["start_indices"])
        limits = list(eqn.params["limit_indices"])
        strides = list(eqn.params["strides"] or [1] * len(starts))
        in_shape = self.shape_of(iv[0])
        dyn_crops = {ax: (src, src_axis) for ax, src, src_axis in
                     self._dyn_crop_axes(in_shape, limits, starts, strides)}
        axes, s, e, st = [], [], [], []
        for ax in range(len(starts)):
            if (ax not in dyn_crops and starts[ax] == 0 and strides[ax] == 1
                    and limits[ax] == in_shape[ax]):
                continue  # no-op on this axis; keeps dynamic axes dynamic
            axes.append(ax)
            s.append(starts[ax])
            # full-width limit with stride: use INT64_MAX so the axis length
            # may vary at runtime
            e.append(_INT64_MAX if limits[ax] == in_shape[ax] else limits[ax])
            st.append(strides[ax])
        if not axes:
            return self.emit(eqn, "Identity", iv)
        if dyn_crops:
            end_parts = []
            for k, ax in enumerate(axes):
                if ax in dyn_crops:
                    src, src_axis = dyn_crops[ax]
                    end_parts.append(self.runtime_dim(src, src_axis))
                else:
                    end_parts.append(self.b.add_initializer(
                        np.asarray([e[k]], np.int64), "ends"))
            if len(end_parts) == 1:
                ends_name = end_parts[0]
            else:
                ends_name = self.b.fresh("ends")
                self.b.add_node("Concat", end_parts, [ends_name], axis=0)
        else:
            ends_name = self.b.add_initializer(np.asarray(e, np.int64), "ends")
        names = [self.materialize(iv[0]),
                 self.b.add_initializer(np.asarray(s, np.int64), "starts"),
                 ends_name,
                 self.b.add_initializer(np.asarray(axes, np.int64), "axes"),
                 self.b.add_initializer(np.asarray(st, np.int64), "steps")]
        out = self.b.fresh("slice")
        self.b.add_node("Slice", names, [out])
        aval = eqn.outvars[0].aval
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    def h_rev(self, eqn, iv):
        dims = list(eqn.params["dimensions"])
        names = [self.materialize(iv[0]),
                 self.b.add_initializer(
                     np.asarray([-1] * len(dims), np.int64), "starts"),
                 self.b.add_initializer(
                     np.asarray([np.iinfo(np.int64).min] * len(dims),
                                np.int64), "ends"),
                 self.b.add_initializer(np.asarray(dims, np.int64), "axes"),
                 self.b.add_initializer(
                     np.asarray([-1] * len(dims), np.int64), "steps")]
        out = self.b.fresh("rev")
        self.b.add_node("Slice", names, [out])
        aval = eqn.outvars[0].aval
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    def h_concatenate(self, eqn, iv):
        return self.emit(eqn, "Concat", iv, axis=int(eqn.params["dimension"]))

    def h_pad(self, eqn, iv):
        x, pad_val = iv
        cfg = eqn.params["padding_config"]
        if any(i for _, _, i in cfg):
            raise NotImplementedError("interior pad")
        if any(lo < 0 or hi < 0 for lo, hi, _ in cfg):
            raise NotImplementedError("negative pad")
        pads = [lo for lo, _, _ in cfg] + [hi for _, hi, _ in cfg]
        names = [self.materialize(x),
                 self.b.add_initializer(np.asarray(pads, np.int64), "pads"),
                 self.materialize(np.asarray(pad_val))]
        out = self.b.fresh("pad")
        self.b.add_node("Pad", names, [out], mode="constant")
        aval = eqn.outvars[0].aval
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    # reductions ------------------------------------------------------------

    def h_reduce_sum(self, eqn, iv):
        axes_t = self.b.add_initializer(
            np.asarray(eqn.params["axes"], np.int64), "axes")
        names = [self.materialize(iv[0]), axes_t]
        out = self.b.fresh("reducesum")
        self.b.add_node("ReduceSum", names, [out], keepdims=0)
        aval = eqn.outvars[0].aval
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    def h_reduce_max(self, eqn, iv):
        # opset 17: ReduceMax axes is an attribute
        return self.emit(eqn, "ReduceMax", iv,
                         axes=list(eqn.params["axes"]), keepdims=0)

    def h_reduce_min(self, eqn, iv):
        return self.emit(eqn, "ReduceMin", iv,
                         axes=list(eqn.params["axes"]), keepdims=0)

    def h_cumsum(self, eqn, iv):
        axis_t = self.b.add_initializer(
            np.asarray(eqn.params["axis"], np.int64), "axis")
        names = [self.materialize(iv[0]), axis_t]
        out = self.b.fresh("cumsum")
        self.b.add_node("CumSum", names, [out],
                        reverse=int(bool(eqn.params.get("reverse", False))))
        aval = eqn.outvars[0].aval
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    # contractions ----------------------------------------------------------

    def h_dot_general(self, eqn, iv):
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        lhs, rhs = iv
        lshape, rshape = self.shape_of(lhs), self.shape_of(rhs)
        letters = iter("abcdefghijklmnopqrstuvwxyz")
        l_sub = [None] * len(lshape)
        r_sub = [None] * len(rshape)
        out_sub = []
        for i, j in zip(lb, rb):
            c = next(letters)
            l_sub[i] = r_sub[j] = c
            out_sub.append(c)
        for i, j in zip(lc, rc):
            c = next(letters)
            l_sub[i] = r_sub[j] = c
        for i in range(len(lshape)):
            if l_sub[i] is None:
                l_sub[i] = next(letters)
                out_sub.append(l_sub[i])
        for j in range(len(rshape)):
            if r_sub[j] is None:
                r_sub[j] = next(letters)
                out_sub.append(r_sub[j])
        eq = f"{''.join(l_sub)},{''.join(r_sub)}->{''.join(out_sub)}"
        out = self.emit(eqn, "Einsum", [lhs, rhs], equation=eq)
        aval = eqn.outvars[0].aval
        if np.dtype(aval.dtype) != self.dtype_of(lhs):
            out = self.emit(eqn, "Cast", [out],
                            to=proto.NP_TO_ONNX[np.dtype(aval.dtype)])
        return out

    def h_conv_general_dilated(self, eqn, iv):
        lhs, rhs = iv
        p = eqn.params
        dn = p["dimension_numbers"]
        lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
        if any(d != 1 for d in p["lhs_dilation"]):
            raise NotImplementedError("lhs-dilated conv (use the subpixel path)")
        if p["batch_group_count"] != 1:
            raise NotImplementedError("batch_group_count > 1")
        nspatial = len(p["window_strides"])
        # lhs → NC<spatial>
        lhs_perm = [lhs_spec[0], lhs_spec[1], *lhs_spec[2:]]
        x_name = self.materialize(lhs)
        if lhs_perm != list(range(len(lhs_perm))):
            t = self.b.fresh("nchw")
            self.b.add_node("Transpose", [x_name], [t], perm=lhs_perm)
            x_name = t
        # rhs → OI<spatial>; params are constants, so this folds to an
        # initializer at export time
        rhs_perm = [rhs_spec[0], rhs_spec[1], *rhs_spec[2:]]
        if self.is_const(rhs):
            w_name = self.b.add_initializer(
                np.transpose(np.asarray(rhs), rhs_perm), "w")
        else:
            w_name = self.b.fresh("wt")
            self.b.add_node("Transpose", [self.materialize(rhs)], [w_name],
                            perm=rhs_perm)
        pads = [lo for lo, _ in p["padding"]] + [hi for _, hi in p["padding"]]
        conv = self.b.fresh("conv")
        self.b.add_node("Conv", [x_name, w_name], [conv],
                        dilations=list(p["rhs_dilation"]),
                        group=int(p["feature_group_count"]),
                        pads=pads, strides=list(p["window_strides"]))
        # conv output is N, C_out, spatial...; permute to out_spec layout
        aval = eqn.outvars[0].aval
        inv = [0] * (nspatial + 2)
        for pos, dim in enumerate([out_spec[0], out_spec[1], *out_spec[2:]]):
            inv[dim] = pos
        if inv != list(range(len(inv))):
            out = self.b.fresh("convout")
            self.b.add_node("Transpose", [conv], [out], perm=inv)
        else:
            out = conv
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

    # gather ----------------------------------------------------------------

    def h_gather(self, eqn, iv):
        operand, indices = iv
        dn = eqn.params["dimension_numbers"]
        slice_sizes = tuple(eqn.params["slice_sizes"])
        op_shape = self.shape_of(operand)
        idx_shape = self.shape_of(indices)
        aval = eqn.outvars[0].aval

        # pattern 1: rows along axis 0 (embedding / tap-table lookup):
        # collapsed=(0,), start_index_map=(0,), full slices on other dims
        if (dn.start_index_map == (0,) and dn.collapsed_slice_dims == (0,)
                and not dn.operand_batching_dims
                and slice_sizes[0] == 1
                and tuple(slice_sizes[1:]) == tuple(op_shape[1:])
                and idx_shape[-1] == 1):
            idx_t = self.b.add_initializer(
                np.asarray(idx_shape[:-1], np.int64), "shape") \
                if len(idx_shape) > 1 else None
            idx_name = self.materialize(indices)
            if idx_t is not None:
                r = self.b.fresh("idx")
                self.b.add_node("Reshape", [idx_name, idx_t], [r])
                idx_name = r
            out = self.b.fresh("gather")
            self.b.add_node("Gather", [self.materialize(operand), idx_name],
                            [out], axis=0)
            return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

        # pattern 2: dynamic_slice along one axis a: start_index_map=(a,),
        # no collapsed dims, slice covers all other dims fully
        if (len(dn.start_index_map) == 1 and not dn.collapsed_slice_dims
                and not dn.operand_batching_dims
                and idx_shape == (1,)
                and all(slice_sizes[d] == op_shape[d]
                        for d in range(len(op_shape))
                        if d != dn.start_index_map[0])):
            ax = dn.start_index_map[0]
            width = slice_sizes[ax]
            idx64 = self.b.fresh("start")
            self.b.add_node("Cast", [self.materialize(indices)], [idx64],
                            to=proto.INT64)
            end = self.b.fresh("end")
            w_t = self.b.add_initializer(np.asarray([width], np.int64), "w")
            self.b.add_node("Add", [idx64, w_t], [end])
            names = [self.materialize(operand), idx64, end,
                     self.b.add_initializer(np.asarray([ax], np.int64), "axes")]
            out = self.b.fresh("dynslice")
            self.b.add_node("Slice", names, [out])
            return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))

        raise NotImplementedError(
            f"gather pattern: dn={dn} slice_sizes={slice_sizes} "
            f"operand={op_shape} indices={idx_shape}")

    def h_iota(self, eqn, iv):
        # no symbolic inputs → always folded; kept for safety
        outs = self._fold(eqn, iv)
        return [np.asarray(o) for o in outs][0]

    def h_dynamic_slice(self, eqn, iv):
        operand, *starts = iv
        op_shape = self.shape_of(operand)
        sizes = list(eqn.params["slice_sizes"])
        aval = eqn.outvars[0].aval
        axes = [ax for ax in range(len(op_shape)) if sizes[ax] != op_shape[ax]
                or not self.is_const(starts[ax])
                or int(np.asarray(starts[ax])) != 0]
        if not axes:
            return self.emit(eqn, "Identity", [operand])
        start_parts, end_parts = [], []
        for ax in axes:
            s = starts[ax]
            if self.is_const(s):
                sv = int(np.clip(int(np.asarray(s)), 0,
                                 op_shape[ax] - sizes[ax]))
                start_parts.append(self.b.add_initializer(
                    np.asarray([sv], np.int64), "start"))
            else:
                c = self.b.fresh("start64")
                r = self.b.fresh("start1")
                self.b.add_node("Cast", [self.materialize(s)], [c],
                                to=proto.INT64)
                one = self.b.add_initializer(np.asarray([1], np.int64), "one")
                self.b.add_node("Reshape", [c, one], [r])
                start_parts.append(r)
            w = self.b.add_initializer(np.asarray([sizes[ax]], np.int64), "w")
            e = self.b.fresh("end")
            self.b.add_node("Add", [start_parts[-1], w], [e])
            end_parts.append(e)

        def _cat(parts, hint):
            if len(parts) == 1:
                return parts[0]
            out = self.b.fresh(hint)
            self.b.add_node("Concat", parts, [out], axis=0)
            return out

        names = [self.materialize(operand), _cat(start_parts, "starts"),
                 _cat(end_parts, "ends"),
                 self.b.add_initializer(np.asarray(axes, np.int64), "axes")]
        out = self.b.fresh("dynslice")
        self.b.add_node("Slice", names, [out])
        return Sym(out, tuple(aval.shape), np.dtype(aval.dtype))


def convert_fn(fn, example_args, param_tree, input_names, output_names,
               dynamic_axes=None, graph_name="graph"):
    """Trace `fn(params, *example_args)` and convert to an ONNX ModelProto.

    param_tree leaves become initializers (named by their tree paths);
    example_args become graph inputs named `input_names`. dynamic_axes:
    {io_name: {axis: "dim_param"}} marks symbolic dims in the I/O signature
    (the reference marks text length / attn / noise axes the same way —
    emotional-vits/export.py:207-226).
    """
    dynamic_axes = dynamic_axes or {}
    closed = jax.make_jaxpr(fn)(param_tree, *example_args)
    jaxpr = closed.jaxpr

    leaves, _ = jax.tree_util.tree_flatten(param_tree)
    paths = [
        "".join(str(getattr(k, "key", getattr(k, "idx", k))) + "."
                for k in path)[:-1]
        for path, _ in jax.tree_util.tree_flatten_with_path(param_tree)[0]]
    n_params = len(leaves)
    flat_inputs, _ = jax.tree_util.tree_flatten(example_args)
    if len(jaxpr.invars) != n_params + len(flat_inputs):
        raise ValueError("unexpected invar count")
    if len(flat_inputs) != len(input_names):
        raise ValueError("input_names must match flattened example_args")

    b = Builder()
    dyn_dims = []
    arg_by_name = dict(zip(input_names, flat_inputs))
    for io_name, ax_map in dynamic_axes.items():
        if io_name in arg_by_name:
            for ax in ax_map:
                dyn_dims.append(
                    (io_name, ax, int(jnp.shape(arg_by_name[io_name])[ax])))
    conv = Converter(b, dyn_dims)
    invals = [np.asarray(leaf) for leaf in leaves]
    # readable initializer names: param leaves keep their tree paths
    conv._const_hints = {id(arr): path.replace("'", "")
                         for arr, path in zip(invals, paths)}
    for name, arg in zip(input_names, flat_inputs):
        wire_dt = np.asarray(arg).dtype        # dtype declared on the wire
        traced_dt = np.dtype(jnp.asarray(arg).dtype)  # x64-off may downcast
        if wire_dt != traced_dt:
            cast = b.fresh(f"{name}_cast")
            b.add_node("Cast", [name], [cast],
                       to=proto.NP_TO_ONNX[traced_dt])
            invals.append(Sym(cast, jnp.shape(arg), traced_dt))
        else:
            invals.append(Sym(name, jnp.shape(arg), traced_dt))
    outs = conv.run(jaxpr, closed.consts, invals)

    out_syms = []
    for name, o in zip(output_names, outs):
        if conv.is_const(o):
            cname = b.add_initializer(np.asarray(o), "const_out")
            b.add_node("Identity", [cname], [name])
            out_syms.append(Sym(name, np.shape(o), np.asarray(o).dtype))
        else:
            b.add_node("Identity", [conv.materialize(o)], [name])
            out_syms.append(Sym(name, o.shape, o.dtype))

    def vi(name, shape, dtype):
        dims = list(shape)
        for ax, param in dynamic_axes.get(name, {}).items():
            dims[ax] = param
        return proto.value_info(name, proto.NP_TO_ONNX[np.dtype(dtype)], dims)

    inputs = [vi(n, jnp.shape(a), np.asarray(a).dtype)
              for n, a in zip(input_names, flat_inputs)]
    outputs = [vi(s.name, s.shape, s.dtype) for s in out_syms]
    g = proto.graph(b.nodes, graph_name, inputs, outputs, b.initializers)
    # record the traced input shapes (the "optimization profile" the graph
    # was specialized at) so tooling can substitute honest sizes for
    # dim_params — python -m vits_tpu.onnx --run reads this
    import json
    traced = {n: [int(d) for d in jnp.shape(a)]
              for n, a in zip(input_names, flat_inputs)}
    return proto.model(g, opset=17,
                       doc="vits_tpu jaxpr export; traced_shapes="
                           + json.dumps(traced))
