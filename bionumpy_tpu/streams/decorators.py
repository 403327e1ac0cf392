"""@streamable decorator (reference: bionumpy/streams/decorators.py:9-110).

If any positional argument is a stream/generator, map the function over
chunks; an optional reduction folds the results.  The reductions used with
it are associative — the same fold the parallel layer merges across
devices with psum (bionumpy_tpu/parallel/).
"""
from __future__ import annotations

import functools
import types

from .stream import BnpStream


class streamable:
    def __init__(self, reduction: callable = None):
        self._reduction = reduction

    @staticmethod
    def _args_stream(args, stream_indices):
        args = list(args)
        streams = tuple(args[i] for i in stream_indices)
        for stream_args in zip(*streams):
            new_args = list(args)
            for i, stream_arg in zip(stream_indices, stream_args):
                new_args[i] = stream_arg
            yield new_args

    def __call__(self, func: callable) -> callable:
        @functools.wraps(func)
        def new_func(*args, **kwargs):
            stream_indices = [
                i for i, arg in enumerate(args)
                if isinstance(arg, (BnpStream, types.GeneratorType))]
            if not stream_indices:
                return func(*args, **kwargs)
            args_stream = self._args_stream(args, stream_indices)
            stream = (func(*new_args, **kwargs) for new_args in args_stream)
            if self._reduction is None:
                return BnpStream(stream)
            return self._reduction(stream)

        return new_func
