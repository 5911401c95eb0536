"""Value-dispatch decorator (parity with reference utils.py:281-303)."""


def dispatch_functool(func):
    registry = {}

    def dispatch(value):
        return registry.get(value, func)

    def register(value, fn=None):
        if fn is None:
            return lambda f: register(value, f)
        registry[value] = fn
        return fn

    def wrapper(*args, **kwargs):
        return dispatch(args[0])(*args[1:], **kwargs)

    wrapper.register = register
    wrapper.dispatch = dispatch
    wrapper.registry = registry
    return wrapper
