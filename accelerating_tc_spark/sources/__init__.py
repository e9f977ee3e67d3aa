"""Edge-table builders: synthetic graphs, TPC-H projections, web-page extraction."""
