"""Object registry: maps deck `type = Foo` names to Python classes.

The analog of MOOSE's Factory/registerMooseObject
(reference: registerMooseObject calls throughout src/).
"""

from __future__ import annotations

from typing import Callable, Dict, Type


class Registry:
    def __init__(self):
        self._classes: Dict[str, type] = {}

    def register(self, *names: str) -> Callable[[type], type]:
        def deco(cls):
            for name in names or (cls.__name__,):
                if name in self._classes and self._classes[name] is not cls:
                    raise ValueError(f"Duplicate registration of '{name}'")
                self._classes[name] = cls
            return cls

        return deco

    def create(self, type_name: str, *args, **kwargs):
        cls = self.get(type_name)
        return cls(*args, **kwargs)

    def get(self, type_name: str) -> type:
        if type_name not in self._classes:
            known = ", ".join(sorted(self._classes))
            raise KeyError(f"Unknown object type '{type_name}'. Known types: {known}")
        return self._classes[type_name]

    def __contains__(self, type_name: str) -> bool:
        return type_name in self._classes


#: compute objects ([TensorComputes/*], [TensorSolver] root computes)
computes = Registry()
#: solver objects ([TensorSolver])
solvers = Registry()
#: predictors ([TensorSolver/Predictors/*])
predictors = Registry()
#: postprocessors ([Postprocessors])
postprocessors = Registry()
#: tensor outputs ([TensorOutputs])
outputs = Registry()
#: LBM stencils ([Stencil])
stencils = Registry()
#: user objects ([UserObjects], e.g. Terminator)
user_objects = Registry()
