"""plotly.colors: the qualitative.Plotly 10-color palette (the only
palette the figure builders cycle through)."""


class qualitative:
    Plotly = [
        "#636EFA", "#EF553B", "#00CC96", "#AB63FA", "#FFA15A",
        "#19D3F3", "#FF6692", "#B6E880", "#FF97FF", "#FECB52",
    ]
