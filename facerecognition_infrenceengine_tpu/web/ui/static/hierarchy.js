// SVG tree diagram — the role Cytoscape plays in the reference UI
// (reference app/templates/index.html "cytoscape-diagram"/"definition-diagram"
// divs + app/static/js/entity-definitions.js render calls), reimplemented as
// a dependency-free tidy-tree layout so the page works with zero egress.

const SVG_NS = 'http://www.w3.org/2000/svg';

function svgEl(tag, attrs = {}) {
  const node = document.createElementNS(SVG_NS, tag);
  for (const [k, v] of Object.entries(attrs)) node.setAttribute(k, v);
  return node;
}

// nodes: [{id, label, sub, parentId}] — renders into `container` (a div).
// opts.onSelect(id) fires on node click; opts.selectedId highlights one node.
function renderTree(container, nodes, opts = {}) {
  clear(container);
  if (!nodes.length) {
    container.append(el('div', { class: 'muted', style: 'padding:16px' },
      'Nothing to display yet.'));
    return;
  }

  const byId = new Map(nodes.map(n => [n.id, { ...n, children: [] }]));
  const roots = [];
  for (const n of byId.values()) {
    const p = n.parentId && byId.get(n.parentId);
    if (p && p !== n) p.children.push(n); else roots.push(n);
  }
  // Nodes inside a parent cycle are neither roots nor reachable from one;
  // promote one node per unplaced component so nothing silently vanishes.
  const reachable = new Set();
  const visit = (n) => {
    if (reachable.has(n.id)) return;
    reachable.add(n.id);
    n.children.forEach(visit);
  };
  roots.forEach(visit);
  for (const n of byId.values()) {
    if (!reachable.has(n.id)) {
      const parent = byId.get(n.parentId);
      if (parent) parent.children = parent.children.filter(c => c !== n);
      roots.push(n);
      visit(n);
    }
  }

  // Tidy layout: leaves get consecutive columns, parents center over children.
  const NODE_W = 150, NODE_H = 44, GAP_X = 26, GAP_Y = 64;
  let nextCol = 0;
  let maxDepth = 0;
  function place(node, depth) {
    maxDepth = Math.max(maxDepth, depth);
    node.depth = depth;
    if (!node.children.length) {
      node.col = nextCol++;
      return;
    }
    for (const c of node.children) place(c, depth + 1);
    node.col = (node.children[0].col + node.children[node.children.length - 1].col) / 2;
  }
  for (const r of roots) { place(r, 0); nextCol += 0.35; }

  const width = Math.max(1, nextCol) * (NODE_W + GAP_X) + GAP_X;
  const height = (maxDepth + 1) * (NODE_H + GAP_Y) + GAP_Y / 2;
  const svg = svgEl('svg', {
    viewBox: `0 0 ${width} ${height}`,
    width: '100%',
    height: Math.min(640, Math.max(300, height)),
    preserveAspectRatio: 'xMidYMin meet',
  });

  const x = n => GAP_X + n.col * (NODE_W + GAP_X);
  const y = n => GAP_Y / 2 + n.depth * (NODE_H + GAP_Y);

  // edges first (under nodes)
  for (const n of byId.values()) {
    for (const c of n.children) {
      const x1 = x(n) + NODE_W / 2, y1 = y(n) + NODE_H;
      const x2 = x(c) + NODE_W / 2, y2 = y(c);
      const midY = (y1 + y2) / 2;
      svg.append(svgEl('path', {
        class: 'svg-edge',
        d: `M ${x1} ${y1} C ${x1} ${midY}, ${x2} ${midY}, ${x2} ${y2}`,
      }));
    }
  }

  for (const n of byId.values()) {
    const g = svgEl('g', {
      class: 'svg-node' + (opts.selectedId === n.id ? ' selected' : ''),
      transform: `translate(${x(n)}, ${y(n)})`,
      style: 'cursor:pointer',
    });
    g.append(svgEl('rect', { width: NODE_W, height: NODE_H, rx: 6 }));
    const label = svgEl('text', { x: 10, y: 18 });
    label.textContent = (n.label || '').slice(0, 19);
    g.append(label);
    const sub = svgEl('text', { x: 10, y: 34, class: 'type' });
    sub.textContent = `${entityGlyph(n.sub)} ${n.sub || ''}`.slice(0, 24);
    g.append(sub);
    if (opts.onSelect) g.addEventListener('click', () => opts.onSelect(n.id));
    svg.append(g);
  }

  container.append(svg);
}

// Renders an entity-definition's type graph (types as nodes, relationships
// as edges) — the reference's "definition-diagram".
function renderDefinitionDiagram(container, definition) {
  const types = Object.keys((definition.structure || {}).entityTypes || {});
  const rels = definition.relationships || [];
  const nodes = types.map(t => {
    const rel = rels.find(r => (r.childType || r.to) === t);
    return {
      id: t,
      label: t.replace(/_/g, ' '),
      sub: t,
      parentId: rel ? (rel.parentType || rel.from) : null,
    };
  });
  // orphan types (no relationship) still render as roots
  renderTree(container, nodes, {});
}
