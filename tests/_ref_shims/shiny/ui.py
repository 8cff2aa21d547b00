"""shiny.ui for the test shim: element factories that build the page
tree, input_* registration, update_* write-back, modals/notifications,
Progress, bind_task_button. Unknown element names fall back to a generic
tag factory (PEP 562 __getattr__), so layout-only API drift never breaks
a boot test."""

from __future__ import annotations

from . import Tag, _TagFactory, get_session

tags = _TagFactory()


def _element(name):
    def make(*children, **attrs):
        t = Tag(name, *children, **attrs)
        get_session().add_to_page(t)
        return t

    make.__name__ = name
    return make


# layout/containers — all context-manager Tags attached to the page
sidebar = _element("sidebar")
navset_pill = _element("navset_pill")
navset_tab = _element("navset_tab")
nav_panel = _element("nav_panel")
layout_columns = _element("layout_columns")
layout_column_wrap = _element("layout_column_wrap")
card = _element("card")
card_header = _element("card_header")
div = _element("div")
p = _element("p")
h4 = _element("h4")
h5 = _element("h5")
hr = _element("hr")
br = _element("br")
span = _element("span")
markdown = _element("markdown")
head_content = _element("head_content")
TagList = tuple  # close enough for the apps' usage


def page_opts(**kwargs):
    get_session().page_opts = kwargs


# ------------------------------------------------------------- inputs
def _register_input(id, default, tagname, **attrs):
    s = get_session()
    s.inputs.setdefault(id, default)
    t = Tag(tagname, id=id, **attrs)
    s.add_to_page(t)
    return t


def input_text(id, label=None, value="", **k):
    return _register_input(id, value, "input_text", label=label)


def input_text_area(id, label=None, value="", **k):
    return _register_input(id, value, "input_text_area", label=label)


def input_numeric(id, label=None, value=0, **k):
    return _register_input(id, value, "input_numeric", label=label)


def input_checkbox(id, label=None, value=False, **k):
    return _register_input(id, bool(value), "input_checkbox", label=label)


def input_checkbox_group(id, label=None, choices=(), selected=None, **k):
    sel = tuple(selected) if selected else ()
    return _register_input(id, sel, "input_checkbox_group", label=label)


def input_radio_buttons(id, label=None, choices=(), selected=None, **k):
    first = list(choices)[0] if choices else None
    return _register_input(
        id, selected if selected is not None else first,
        "input_radio_buttons", label=label,
    )


def input_select(id, label=None, choices=(), selected=None, **k):
    if selected is None and choices:
        selected = list(choices)[0]
    return _register_input(id, selected, "input_select", label=label)


input_selectize = input_select


def input_slider(id, label=None, min=None, max=None, value=None, **k):
    return _register_input(id, value, "input_slider", label=label)


def input_file(id, label=None, **k):
    return _register_input(id, None, "input_file", label=label)


def input_action_button(id, label=None, **k):
    get_session().action_buttons.add(id)
    return _register_input(id, 0, "input_action_button", label=label)


input_action_link = input_action_button
input_task_button = input_action_button


def input_switch(id, label=None, value=False, **k):
    return _register_input(id, bool(value), "input_switch", label=label)


def input_dark_mode(id=None, **k):
    return Tag("input_dark_mode")


# ------------------------------------------------------------ updates
def _update(id, value):
    if value is not None:
        get_session().set_input(id, value)


def update_text(id, value=None, **k):
    _update(id, value)


update_text_area = update_text


def update_numeric(id, value=None, **k):
    _update(id, value)


def update_checkbox(id, value=None, **k):
    _update(id, value)


def update_slider(id, value=None, **k):
    _update(id, value)


def update_radio_buttons(id, selected=None, **k):
    _update(id, selected)


def update_select(id, selected=None, choices=None, **k):
    if selected is None and choices:
        selected = list(choices)[0]
    _update(id, selected)


update_selectize = update_select


def update_checkbox_group(id, selected=None, **k):
    if selected is not None:
        get_session().set_input(id, tuple(selected))


# ---------------------------------------------------- modals & notices
def modal(*children, title=None, easy_close=True, footer=None, **k):
    return Tag("modal", *children, title=title)


def modal_show(m):
    get_session().modals.append(m)


def modal_remove():
    pass


def notification_show(message, type="message", duration=None, **k):
    get_session().notifications.append((type, str(message)))


class Progress:
    def __init__(self, min=0, max=1, session=None):
        self.min, self.max = min, max

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def set(self, value=None, message=None, detail=None):
        self.value, self.message, self.detail = value, message, detail

    def close(self):
        pass


def bind_task_button(button_id=None, **k):
    def deco(task):
        return task

    return deco


def busy_indicators(*a, **k):
    return Tag("busy_indicators")


def __getattr__(name):  # PEP 562: unknown ui element -> generic factory
    if name.startswith("input_"):
        def make(id, *a, **k):
            return _register_input(id, k.get("value"), name)

        return make
    if name.startswith("update_"):
        def make(id, **k):
            _update(id, k.get("value", k.get("selected")))

        return make
    return _element(name)
