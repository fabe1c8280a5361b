package graft.api

/** The reference's web GUI (internal/web/Web.go:104-160 serves an
  * embedded `static/dist` bundle at `/`, `/search` and `/config`;
  * the pages are a search UI over the `api/v1` job endpoints and a
  * config editor over `GET|POST config` + `GET config/schema`,
  * internal/web/static/src/pages/{search,config}.tsx) rebuilt as two
  * self-contained hand-written HTML pages — zero build step, zero
  * dependencies, served as string constants by [[HttpApi]].
  *
  * Faithful to the reference's interaction model, not its pixels:
  *
  *   - the search page starts a job (`POST startJob` with the selected
  *     relative-time window), polls `jobStats` while the job pump runs
  *     (state 1 = running), then pages `jobResults` skip/take and
  *     renders events (newest-first, expandable extracted-fields) or
  *     table results (columnOrder-driven); the field sidebar lists
  *     `FieldCount` and a click drills into `jobFieldStats` value
  *     counts — exactly the calls SearchPage.tsx wires
  *     (startJob/pollJob/getResults/abortJob/getFieldValueCounts).
  *   - the config page loads the attached file (`GET config`), saves it
  *     through the validated atomic-swap POST, and surfaces the served
  *     schema plus the three enum helpers (fileTypes / files /
  *     hostTypes — internal/web/EnumProvider.go).
  *
  * Everything below speaks only the public wire protocol — the GUI is a
  * plain API client and exercises the same endpoints HttpApiSpec gates.
  */
object WebGui {

  private val style = """
  <style>
    :root { color-scheme: light; }
    body { font-family: system-ui, sans-serif; margin: 0; color: #1f2430; }
    nav { background: #232a3b; color: #fff; padding: 10px 18px; display: flex; gap: 18px; align-items: baseline; }
    nav .brand { font-weight: 700; letter-spacing: .4px; }
    nav a { color: #cdd6ee; text-decoration: none; }
    nav a:hover { color: #fff; }
    main { padding: 18px; max-width: 1100px; margin: 0 auto; }
    .row { display: flex; gap: 8px; margin-bottom: 12px; }
    input#search-input { flex: 1; padding: 8px 10px; font-size: 15px; border: 1px solid #b9c0d0; border-radius: 4px; }
    select, button { padding: 8px 10px; font-size: 14px; border: 1px solid #b9c0d0; border-radius: 4px; background: #fff; cursor: pointer; }
    button.primary { background: #2f54d0; color: #fff; border-color: #2f54d0; }
    button:disabled { opacity: .5; cursor: default; }
    #status { color: #5a6478; margin: 8px 0; min-height: 1.2em; }
    .layout { display: flex; gap: 16px; align-items: flex-start; }
    #fields { width: 240px; flex: none; border: 1px solid #e0e4ee; border-radius: 6px; padding: 10px; }
    #fields h3 { margin: 0 0 8px; font-size: 14px; }
    #fields .field { cursor: pointer; padding: 2px 4px; border-radius: 3px; display: flex; justify-content: space-between; }
    #fields .field:hover { background: #eef1f8; }
    #fields .vals { margin: 2px 0 6px 10px; color: #5a6478; font-size: 13px; }
    #results { flex: 1; min-width: 0; }
    table { border-collapse: collapse; width: 100%; font-size: 13px; }
    th, td { text-align: left; border-bottom: 1px solid #e0e4ee; padding: 5px 8px; vertical-align: top; }
    td.raw { font-family: ui-monospace, monospace; white-space: pre-wrap; word-break: break-all; }
    tr.meta td { color: #5a6478; font-size: 12px; background: #f7f8fb; }
    .pager { margin: 10px 0; display: flex; gap: 8px; align-items: center; }
    textarea#config-text { width: 100%; min-height: 320px; font-family: ui-monospace, monospace; font-size: 13px; box-sizing: border-box; }
    pre#config-schema { background: #f7f8fb; border: 1px solid #e0e4ee; border-radius: 6px; padding: 10px; overflow: auto; max-height: 320px; font-size: 12px; }
    .chip { display: inline-block; background: #eef1f8; border-radius: 10px; padding: 2px 10px; margin: 2px; font-size: 12px; }
  </style>
  """

  private def shell(title: String, body: String): String =
    "<!doctype html>\n<html><head><meta charset=\"utf-8\"><title>" + title +
      "</title>" + style + "</head><body>\n" +
      """<nav><span class="brand">graft</span><a href="/search">Search</a><a href="/config">Config</a></nav>""" +
      "\n<main>\n" + body + "\n</main></body></html>\n"

  /** `/` and `/search` — the job-driven search UI. */
  val searchPage: String = shell("graft — search", """
  <div class="row">
    <input id="search-input" placeholder="search string, e.g. error | table &quot;userid,eventtype&quot;" autofocus>
    <select id="time-select">
      <option value="">All time</option>
      <option value="-15m">Last 15 minutes</option>
      <option value="-60m">Last 60 minutes</option>
      <option value="-4h">Last 4 hours</option>
      <option value="-24h">Last 24 hours</option>
      <option value="-168h">Last 7 days</option>
      <option value="-720h">Last 30 days</option>
    </select>
    <button id="search-btn" class="primary">Search</button>
    <button id="abort-btn" disabled>Abort</button>
  </div>
  <div id="status">Enter a search to get started.</div>
  <div class="layout">
    <div id="fields" hidden><h3>Fields</h3><div id="field-list"></div></div>
    <div id="results">
      <div class="pager" hidden id="pager">
        <button id="prev-btn">&#8592; Prev</button>
        <span id="page-label"></span>
        <button id="next-btn">Next &#8594;</button>
      </div>
      <table id="result-table" hidden><thead id="result-head"></thead><tbody id="result-body"></tbody></table>
    </div>
  </div>
  <script>
  "use strict";
  var TAKE = 25;
  var jobId = null, stats = null, skip = 0, polling = false, aborted = false;
  function el(id) { return document.getElementById(id); }
  function esc(s) { var d = document.createElement('span'); d.textContent = String(s); return d.innerHTML; }
  function sleep(ms) { return new Promise(function (r) { setTimeout(r, ms); }); }
  async function api(path, opts) {
    var r = await fetch(path, opts);
    if (!r.ok) throw new Error(r.status + ': ' + await r.text());
    return r.json();
  }
  async function runSearch() {
    var q = el('search-input').value;
    var rel = el('time-select').value;
    var url = '/api/v1/startJob?searchString=' + encodeURIComponent(q);
    if (rel) url += '&relativeTime=' + encodeURIComponent(rel);
    el('search-btn').disabled = true; el('abort-btn').disabled = false;
    el('status').textContent = 'Starting job…';
    try {
      aborted = false;
      jobId = await api(url, { method: 'POST' });
      polling = true;
      while (polling) {
        stats = await api('/api/v1/jobStats?jobId=' + jobId);
        el('status').textContent = 'Job ' + jobId +
          (stats.State === 1 ? ' running… ' : ' finished — ') +
          stats.NumMatchedEvents + ' matched events';
        if (stats.State !== 1) break;
        await sleep(300);
      }
      if (aborted) return; // abort already reported; don't page a dead job
      skip = 0;
      await loadPage();
      renderFields();
    } catch (e) {
      el('status').textContent = 'Search failed — ' + e.message;
    } finally {
      el('search-btn').disabled = false; el('abort-btn').disabled = true; polling = false;
    }
  }
  async function abortJob() {
    if (jobId === null) return;
    aborted = true;
    polling = false;
    await fetch('/api/v1/abortJob?jobId=' + jobId, { method: 'POST' });
    el('status').textContent = 'Job ' + jobId + ' aborted.';
  }
  async function loadPage() {
    var res = await api('/api/v1/jobResults?jobId=' + jobId + '&skip=' + skip + '&take=' + TAKE);
    var head = el('result-head'), body = el('result-body');
    head.innerHTML = ''; body.innerHTML = '';
    var n = 0;
    if (res.resultType === 2) {
      var cols = res.columnOrder;
      head.innerHTML = '<tr>' + cols.map(function (c) { return '<th>' + esc(c) + '</th>'; }).join('') + '</tr>';
      res.tableRows.forEach(function (row) {
        body.insertAdjacentHTML('beforeend', '<tr>' + cols.map(function (c) {
          return '<td>' + esc(row[c] == null ? '' : row[c]) + '</td>';
        }).join('') + '</tr>');
      });
      n = res.tableRows.length;
    } else {
      head.innerHTML = '<tr><th style="width:175px">Time</th><th>Event</th></tr>';
      res.events.forEach(function (ev) {
        var fields = Object.keys(ev.Fields || {}).sort().map(function (k) {
          return esc(k) + '=' + esc(ev.Fields[k]);
        }).join('  ');
        body.insertAdjacentHTML('beforeend',
          '<tr><td>' + esc(ev.Timestamp) + '</td><td class="raw">' + esc(ev.Raw) + '</td></tr>' +
          '<tr class="meta"><td></td><td>' + esc(ev.Source) + ' &middot; ' + esc(ev.Host) +
          (fields ? ' &middot; ' + fields : '') + '</td></tr>');
      });
      n = res.events.length;
    }
    el('result-table').hidden = false;
    el('pager').hidden = false;
    el('page-label').textContent = 'rows ' + (n ? skip + 1 : skip) + '–' + (skip + n);
    el('prev-btn').disabled = skip === 0;
    el('next-btn').disabled = n < TAKE;
  }
  function renderFields() {
    var list = el('field-list');
    list.innerHTML = '';
    var fc = (stats && stats.FieldCount) || {};
    var names = Object.keys(fc).sort();
    el('fields').hidden = names.length === 0;
    names.forEach(function (name) {
      var row = document.createElement('div');
      row.className = 'field';
      row.innerHTML = '<span>' + esc(name) + '</span><span>' + esc(fc[name]) + '</span>';
      var vals = document.createElement('div');
      vals.className = 'vals'; vals.hidden = true;
      row.addEventListener('click', async function () {
        if (!vals.hidden) { vals.hidden = true; return; }
        var counts = await api('/api/v1/jobFieldStats?jobId=' + jobId +
          '&fieldName=' + encodeURIComponent(name));
        vals.innerHTML = Object.keys(counts).sort(function (a, b) { return counts[b] - counts[a]; })
          .slice(0, 10).map(function (v) { return esc(v) + ' (' + counts[v] + ')'; }).join('<br>');
        vals.hidden = false;
      });
      list.appendChild(row); list.appendChild(vals);
    });
  }
  el('search-btn').addEventListener('click', runSearch);
  el('abort-btn').addEventListener('click', abortJob);
  function pageTo(s) {
    skip = s;
    loadPage().catch(function (e) { el('status').textContent = 'Page load failed — ' + e.message; });
  }
  el('prev-btn').addEventListener('click', function () { pageTo(Math.max(0, skip - TAKE)); });
  el('next-btn').addEventListener('click', function () { pageTo(skip + TAKE); });
  el('search-input').addEventListener('keydown', function (e) {
    // mirror the button: no concurrent second job while one is polling
    if (e.key === 'Enter' && !el('search-btn').disabled) runSearch();
  });
  </script>
  """)

  /** `/config` — editor over `GET|POST config`, schema + enum helpers. */
  val configPage: String = shell("graft — config", """
  <h2>Configuration</h2>
  <div id="config-status" style="color:#5a6478;margin-bottom:8px"></div>
  <textarea id="config-text" spellcheck="false"></textarea>
  <div class="row" style="margin-top:8px">
    <button id="save-btn" class="primary">Save</button>
    <button id="reload-btn">Reload</button>
  </div>
  <h3>Enums</h3>
  <div id="enums"></div>
  <h3>Schema (the honored subset)</h3>
  <pre id="config-schema">loading…</pre>
  <script>
  "use strict";
  function el(id) { return document.getElementById(id); }
  function esc(s) { var d = document.createElement('span'); d.textContent = String(s); return d.innerHTML; }
  async function loadConfig() {
    var r = await fetch('/api/v1/config');
    if (r.ok) {
      el('config-text').value = JSON.stringify(JSON.parse(await r.text()), null, 2);
      el('config-status').textContent = 'Loaded from the attached config file.';
    } else {
      el('config-text').value = '';
      el('config-status').textContent = 'No config file attached (' + r.status + ').';
      el('save-btn').disabled = true;
    }
  }
  async function saveConfig() {
    var r = await fetch('/api/v1/config', { method: 'POST', body: el('config-text').value });
    el('config-status').textContent = r.ok ? 'Saved.' : 'Save failed — ' + await r.text();
  }
  async function loadSchema() {
    var r = await fetch('/api/v1/config/schema');
    el('config-schema').textContent = r.ok
      ? JSON.stringify(await r.json(), null, 2)
      : 'schema unavailable — ' + r.status;
  }
  async function loadEnums() {
    var names = ['fileTypes', 'files', 'hostTypes'];
    var html = '';
    for (var i = 0; i < names.length; i++) {
      var r = await fetch('/api/v1/enums/' + names[i]);
      var vals = r.ok ? await r.json() : [];
      html += '<div><b>' + names[i] + ':</b> ' +
        (vals.length ? vals.map(function (v) { return '<span class="chip">' + esc(v) + '</span>'; }).join('')
                     : '<span class="chip">(none)</span>') + '</div>';
    }
    el('enums').innerHTML = html;
  }
  el('save-btn').addEventListener('click', saveConfig);
  el('reload-btn').addEventListener('click', loadConfig);
  loadConfig(); loadSchema(); loadEnums();
  </script>
  """)
}
