"""Pull-based lazy computation graph over chunk streams
(reference: bionumpy/computation_graph.py).

The runtime model: a ComputationNode evaluates one chunk at a time in
lock-step over all its inputs (`_get_buffer(i)`), so an arbitrary DAG of
per-chunk expressions plus associative reductions runs in a single pass
over the file.  On TPU the per-chunk function is typically a jit-compiled
kernel and the reduction state an on-device accumulator; across hosts the
same associative fold merges with psum (bionumpy_tpu/parallel/).
"""
from __future__ import annotations

import operator
from abc import ABC, abstractmethod
from functools import reduce
from itertools import count
from traceback import extract_stack, format_list

import numpy as np


class ComputationException(Exception):
    pass


def _add_histograms(a, b):
    assert np.all(a[1] == b[1])
    return (a[0] + b[0], a[1])


def mean_reduction(a, b):
    return (a[0] + b[0], a[1] + b[1])


def sum_and_n(array, axis=None):
    if array.size == 0:
        return 0, 0
    s = np.sum(array, axis=axis)
    assert axis in (None, 0, -2), axis
    if axis is None:
        n = array.size
    else:
        if hasattr(array, "lengths"):
            lengths = np.asarray(array.lengths)
            counts = np.bincount(lengths)
            n = np.cumsum(counts[::-1])[::-1][1:]
        else:
            n = len(array)
    return (s, n)


reductions_map = {
    np.sum: operator.add,
    np.histogram: _add_histograms,
}


class Node(np.lib.mixins.NDArrayOperatorsMixin, ABC):
    @abstractmethod
    def _get_buffer(self, i: int):
        raise NotImplementedError

    def __array_ufunc__(self, ufunc, method, *args, **kwargs):
        assert method == "__call__"
        stack_trace = "".join(format_list(extract_stack(limit=5)))
        return ComputationNode(ufunc, args, kwargs, stack_trace=stack_trace)

    def __array_function__(self, func, types, args, kwargs):
        stack_trace = "".join(format_list(extract_stack(limit=10))[:-2])
        if func is np.mean and kwargs.get("axis") in (None, 0):
            comp_node = ComputationNode(sum_and_n, args, kwargs,
                                        stack_trace=stack_trace)
            return ReductionNode(comp_node, mean_reduction,
                                 lambda sn: sn[0] / sn[1])
        comp_node = ComputationNode(func, args, kwargs,
                                    stack_trace=stack_trace)
        if func in reductions_map:
            return ReductionNode(comp_node, reductions_map[func])
        return comp_node

    def compute(self):
        raise NotImplementedError

    def get_iter(self):
        for i in count():
            try:
                yield self._get_buffer(i)
            except StopIteration:
                break

    def __str__(self):
        return (f"{self.__class__.__name__} with current buffer: "
                f"{getattr(self, '_current_buffer', None)}")


class StreamNode(Node):
    def __init__(self, stream):
        self._stream = iter(stream)
        self._current_buffer = None
        self._buffer_index = -1
        self._get_buffer(0)

    def _get_buffer(self, i: int):
        assert self._buffer_index in (i, i - 1), (i, self._buffer_index)
        if i > self._buffer_index:
            self._current_buffer = next(self._stream)
            self._buffer_index += 1
        return self._current_buffer

    def compute(self):
        return np.concatenate(list(self.get_iter()))


class ComputationNode(Node):
    def __init__(self, func, args, kwargs=None, stack_trace=None):
        self._func = func
        self._args = args
        self._kwargs = kwargs if kwargs is not None else {}
        self._stack_trace = stack_trace or "".join(
            format_list(extract_stack(limit=5))[:-2])
        self._buffer_index = -1
        self._get_buffer(0)

    def __getitem__(self, item):
        return ComputationNode(lambda obj, it: obj[it], (self, item))

    def max(self, axis=None, **kwargs):
        assert axis == -1, axis
        return np.max(self, axis=-1, **kwargs)

    def mean(self, axis=None):
        if axis in (-1, 1, 0, None):
            return np.mean(self, axis=axis)
        raise ValueError("invalid axis for mean", axis)

    def sum(self, *args, **kwargs):
        return np.sum(self, *args, **kwargs)

    def _get_buffer(self, i: int):
        assert self._buffer_index in (i, i - 1), (i, self._buffer_index)
        if i <= self._buffer_index:
            return self._current_buffer
        args = [a._get_buffer(i) if isinstance(a, Node) else a
                for a in self._args]
        kwargs = {key: (v._get_buffer(i) if isinstance(v, Node) else v)
                  for key, v in self._kwargs.items()}
        try:
            self._current_buffer = self._func(*args, **kwargs)
        except StopIteration:
            raise
        except ComputationException:
            raise
        except Exception as e:
            raise ComputationException(
                f"Error in computation of:\n {self._stack_trace}") from e
        self._buffer_index += 1
        return self._current_buffer

    def compute(self):
        return np.concatenate(list(self.get_iter()))


class ReductionNode(Node):
    def __init__(self, stream, binary_func, post_process=None):
        self._stream = stream
        self._binary_func = binary_func
        self._post_process = post_process

    def _get_buffer(self, i: int):
        raise NotImplementedError

    def compute(self):
        result = reduce(self._binary_func, self._stream.get_iter())
        if self._post_process is not None:
            result = self._post_process(result)
        return result

    @classmethod
    def join(cls, reduction_nodes):
        node = ComputationNode(lambda *args: tuple(args),
                               [n._stream for n in reduction_nodes])
        binary_func = lambda t1, t2: tuple(  # noqa: E731
            n._binary_func(e1, e2)
            for n, e1, e2 in zip(reduction_nodes, t1, t2))
        post_process = lambda t: [  # noqa: E731
            e if n._post_process is None else n._post_process(e)
            for e, n in zip(t, reduction_nodes)]
        return cls(node, binary_func, post_process)

    def __str__(self):
        return f"{self._binary_func} reduction of: {self._stream}"


class JoinNode(ComputationNode):
    def compute(self):
        buffer_list = None
        for buffer_tuple in self.get_iter():
            if buffer_list is None:
                buffer_list = [list() for _ in buffer_tuple]
            for column, buf in zip(buffer_list, buffer_tuple):
                column.append(buf)
        return [np.concatenate(column) for column in buffer_list]


def _compute(*args):
    if not any(isinstance(a, Node) for a in args):
        return args
    if all(isinstance(a, ReductionNode) for a in args):
        return ReductionNode.join(args).compute()
    assert not any(isinstance(a, ReductionNode) for a in args)
    node_idxs = [i for i, a in enumerate(args) if isinstance(a, Node)]
    results = JoinNode(lambda *a: tuple(a),
                       [args[i] for i in node_idxs]).compute()
    args = list(args)
    for i, idx in enumerate(node_idxs):
        args[idx] = results[i]
    return args


def compute(args):
    """Evaluate one or several graph nodes in a single pass."""
    if isinstance(args, dict):
        return dict(zip(args.keys(), _compute(*args.values())))
    if isinstance(args, (list, tuple)):
        return _compute(*args)
    if isinstance(args, Node):
        return args.compute()
    return args
