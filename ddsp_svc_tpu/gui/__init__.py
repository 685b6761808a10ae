from .i18n import LOCALES, get_locale  # noqa: F401
from .web import DEFAULTS, GuiApp, serve  # noqa: F401
